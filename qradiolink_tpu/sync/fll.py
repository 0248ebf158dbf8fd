"""FLL band-edge coarse frequency acquisition.

Equivalent of gr::digital::fll_band_edge_cc (reference
src/gr/gr_demod_bpsk.cpp FLL(sps, 0.35, 32, 2pi/100); also QPSK/2FSK heads).

TPU-native reformulation: instead of a per-sample feedback loop through the
band-edge filters, the block is processed in sub-blocks ("estimate then
apply"): for each sub-block the current NCO derotates vectorized, the two
band-edge filters run as batched FIRs, the energy difference drives one
frequency update per sub-block. This keeps all heavy work vectorized while
converging to the same lock point (band-edge energy balance); the loop only
needs to hand a coarse-corrected signal to the Costas/timing loops, so the
sub-block update granularity is behaviorally equivalent.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import conv1d_valid
from qradiolink_tpu.sync.costas import loop_gains


def band_edge_taps(sps: float, rolloff: float, ntaps: int):
    """Upper/lower band-edge filters: complex band-passes straddling the
    RRC band edges at +/-(1+rolloff)/(2*sps) cycles/sample."""
    center = (1.0 + rolloff) / (2.0 * sps)  # cycles/sample
    width = max(rolloff / sps, 1.0 / ntaps)
    fs = 1.0
    upper = firdes.complex_band_pass(
        1.0, fs, center - width / 2, center + width / 2, width / 2, ntaps=ntaps)
    lower = firdes.complex_band_pass(
        1.0, fs, -center - width / 2, -center + width / 2, width / 2, ntaps=ntaps)
    return upper, lower


class FllBandEdge(Block):
    """Coarse AFC; state (phase, freq, fir tail). freq in rad/sample."""

    def __init__(self, sps: float, rolloff: float, filter_size: int,
                 loop_bw: float, sub_block: int = 512, lead_shape: tuple = ()):
        upper, lower = band_edge_taps(sps, rolloff, filter_size)
        self.upper = jnp.asarray(upper)
        self.lower = jnp.asarray(lower)
        self.ntaps = int(filter_size)
        _, self.beta = loop_gains(loop_bw)
        self.max_freq = 2.0 * np.pi / float(sps) * (1.0 + rolloff)
        self.sub_block = int(sub_block)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        z = jnp.zeros(self.lead_shape, dtype=jnp.float32)
        tail = jnp.zeros(self.lead_shape + (self.ntaps - 1,), jnp.complex64)
        return (z, z, tail)

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            # the band-edge loop is inherently complex (phase-rotation
            # scan); convert at entry — these feedback chains are the
            # low-rate scan paths, not the TPU hot path
            x = x.to_complex()
        phase0, freq0, tail0 = state
        T = x.shape[-1]
        sb = min(self.sub_block, T)
        while T % sb != 0:  # largest divisor of T not above sub_block
            sb -= 1
        n_sub = T // sb
        xs = jnp.moveaxis(
            x.reshape(x.shape[:-1] + (n_sub, sb)), -2, 0)  # (n_sub, ..., sb)

        n = jnp.arange(sb, dtype=jnp.float32)

        def step(carry, xb):
            phase, freq, tail = carry
            ph = phase[..., None] + freq[..., None] * n
            y = xb * jnp.exp(-1j * ph).astype(jnp.complex64)
            yc = jnp.concatenate([tail, y], axis=-1)
            u = conv1d_valid(yc, self.upper)
            l = conv1d_valid(yc, self.lower)
            err = jnp.mean(jnp.abs(u) ** 2 - jnp.abs(l) ** 2, axis=-1)
            err = jnp.clip(err, -1.0, 1.0)
            new_freq = jnp.clip(freq + self.beta * err,
                                -self.max_freq, self.max_freq)
            new_phase = jnp.mod(phase + freq * sb, 2 * np.pi)
            new_tail = yc[..., yc.shape[-1] - (self.ntaps - 1):]
            return (new_phase, new_freq, new_tail), y

        (phase, freq, tail), ys = jax.lax.scan(step, (phase0, freq0, tail0), xs)
        y = jnp.moveaxis(ys, 0, -2).reshape(x.shape)
        return (phase, freq, tail), y
