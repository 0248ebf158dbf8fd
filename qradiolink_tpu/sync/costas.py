"""Costas loop carrier recovery (order 2 = BPSK, 4 = QPSK).

Equivalent of gr::digital::costas_loop_cc used in every PSK chain
(reference src/gr/gr_demod_bpsk.cpp Costas(2pi/200, 2),
gr_demod_qpsk.cpp Costas(pi/200 .. pi/400, 4)). Second-order loop with
critically-damped gains derived from the loop bandwidth, phase/frequency
state carried across blocks. Sequential by nature -> lax.scan over the
block; cheap at symbol-rate sample rates.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block


def loop_gains(loop_bw: float, damping: float = np.sqrt(2.0) / 2.0):
    """Standard 2nd-order PLL gain mapping (alpha: phase, beta: freq)."""
    denom = 1.0 + 2.0 * damping * loop_bw + loop_bw * loop_bw
    alpha = (4.0 * damping * loop_bw) / denom
    beta = (4.0 * loop_bw * loop_bw) / denom
    return float(alpha), float(beta)


class CostasLoop(Block):
    """De-rotates x by the tracked carrier; state (phase, freq)."""

    def __init__(self, loop_bw: float, order: int, max_freq: float = 1.0,
                 lead_shape: tuple = ()):
        if order not in (2, 4):
            raise ValueError("order must be 2 (BPSK) or 4 (QPSK)")
        self.order = order
        self.alpha, self.beta = loop_gains(loop_bw)
        self.max_freq = float(max_freq)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        z = jnp.zeros(self.lead_shape, dtype=jnp.float32)
        return (z, z)  # phase, freq

    def _error(self, y):
        if self.order == 2:
            return y.imag * jnp.sign(y.real)
        # order 4: decision-directed cross product
        return (jnp.sign(y.real) * y.imag - jnp.sign(y.imag) * y.real)

    def __call__(self, state, x):
        phase0, freq0 = state

        def step(carry, xn):
            phase, freq = carry
            nco = jnp.exp(-1j * phase.astype(jnp.float32))
            y = xn * nco
            err = jnp.clip(self._error(y), -1.0, 1.0)
            freq = jnp.clip(freq + self.beta * err, -self.max_freq, self.max_freq)
            phase = phase + freq + self.alpha * err
            phase = jnp.mod(phase + np.pi, 2 * np.pi) - np.pi
            return (phase, freq), y

        xs = jnp.moveaxis(x, -1, 0)
        (phase, freq), ys = jax.lax.scan(step, (phase0, freq0), xs)
        return (phase, freq), jnp.moveaxis(ys, 0, -1)
