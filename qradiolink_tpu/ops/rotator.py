"""Complex rotator / frequency translator.

Equivalent of gr::blocks::rotator_cc used for carrier-offset correction at
the head of every chain (reference src/gr/gr_demod_base.cpp:1220-1224 sets
phase increment 2*pi*(-offset)/samp_rate). State is the carried phase
(float64 accumulator to avoid drift over long streams); the complex
exponential ramp for a block is generated vectorized.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block


class Rotator(Block):
    """y[n] = x[n] * exp(j*(phase0 + n*phase_inc)); carries phase mod 2pi."""

    def __init__(self, phase_inc: float, lead_shape: tuple = ()):
        self.phase_inc = float(phase_inc)
        self.lead_shape = tuple(lead_shape)

    @classmethod
    def from_offset(cls, offset_hz: float, samp_rate: float, **kw):
        return cls(2.0 * jnp.pi * (-offset_hz) / samp_rate, **kw)

    def init_state(self):
        return jnp.zeros(self.lead_shape, dtype=jnp.float32)

    def __call__(self, state, x):
        t = x.shape[-1]
        # keep the per-sample phase ramp accurate over long blocks by
        # wrapping the increment contribution before it grows: split the
        # ramp into (wrapped whole-block advance) handled in the carried
        # state and an in-block ramp computed in float32 after mod-2pi.
        inc = float(self.phase_inc)
        # n*inc computed as q*(4096*inc mod 2pi) + r*inc with the coarse
        # term pre-wrapped in double on host, so float32 stays accurate
        # for million-sample blocks
        n = jnp.arange(t, dtype=jnp.int32)
        q = (n // 4096).astype(jnp.float32)
        r = (n % 4096).astype(jnp.float32)
        coarse = (4096 * inc) % (2.0 * np.pi)
        ramp = jnp.mod(q * coarse + r * inc, 2.0 * np.pi).astype(jnp.float32)
        ph = state[..., None] + ramp
        # advance carried phase exactly using Python-float (double) mod
        block_adv = (t * inc) % (2.0 * np.pi)
        new_phase = jnp.mod(state + jnp.float32(block_adv), 2.0 * jnp.pi)
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            # complex-free plane rotation (1 Msps hot path; see
            # core.IqPair for why complex64 is avoided on this backend)
            c, s = jnp.cos(ph), jnp.sin(ph)
            return new_phase, IqPair(x.re * c - x.im * s,
                                     x.re * s + x.im * c)
        w = jnp.exp(1j * ph).astype(jnp.complex64)
        y = x * w
        return new_phase, y
