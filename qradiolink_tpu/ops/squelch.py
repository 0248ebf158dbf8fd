"""Squelch gates: power squelch and CTCSS tone squelch.

Power squelch mirrors gr::analog::pwr_squelch_cc (reference
src/gr/gr_demod_nbfm.cpp uses pwr_squelch(-140 dB, alpha 0.01, ramp 320)):
a single-pole IIR average of |x|^2 compared against a dB threshold, with a
raised-cosine ramp applied over `ramp` samples on open/close transitions.
The IIR average is a linear recurrence (parallel scan); the gate and ramp
are elementwise, so the whole block stays vectorized.

CTCSS squelch mirrors gr::analog::ctcss_squelch_ff: Goertzel energy at the
tone frequency vs. its +/- neighbors over a detection window.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.ops.iir import linear_recurrence


class PowerSquelch(Block):
    """Gate x to zero while smoothed power is below threshold_db.

    State: (avg_power, prev_gate, ramp_pos). The ramp applies a smooth
    cosine envelope over `ramp` samples after a gate transition.
    """

    def __init__(self, threshold_db: float, alpha: float = 0.0001,
                 ramp: int = 0, lead_shape: tuple = ()):
        self.threshold = 10.0 ** (float(threshold_db) / 10.0)
        self.alpha = float(alpha)
        self.ramp = int(ramp)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        z = jnp.zeros(self.lead_shape, dtype=jnp.float32)
        return (z, z)  # avg power, previous envelope value

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        avg0, env_prev = state
        pair = isinstance(x, IqPair)
        if pair:
            p = x.re * x.re + x.im * x.im
        else:
            p = (x.real * x.real + x.imag * x.imag).astype(jnp.float32) \
                if jnp.iscomplexobj(x) else (x * x).astype(jnp.float32)
        avg = linear_recurrence(jnp.asarray(1.0 - self.alpha, jnp.float32),
                                self.alpha * p, avg0)
        gate = (avg >= self.threshold).astype(jnp.float32)
        if self.ramp > 0:
            # envelope follows gate with a first-order lag ~ ramp samples,
            # approximating the reference's cosine ramp length
            beta = 1.0 / float(self.ramp)
            env = linear_recurrence(jnp.asarray(1.0 - beta, jnp.float32),
                                    beta * gate, env_prev)
        else:
            env = gate
        if pair:
            y = IqPair(x.re * env, x.im * env)
        else:
            y = x * env.astype(x.real.dtype)
        return (avg[..., -1], env[..., -1]), y


def _goertzel_energy(x, freq, samp_rate):
    """Goertzel tone energy per window (x: (..., W))."""
    w = x.shape[-1]
    n = jnp.arange(w, dtype=jnp.float32)
    ph = 2.0 * np.pi * freq / samp_rate * n
    c = jnp.cos(ph)
    s = jnp.sin(ph)
    re = jnp.sum(x * c, axis=-1)
    im = jnp.sum(x * s, axis=-1)
    return re * re + im * im


class CtcssSquelch(Block):
    """Tone squelch: pass audio only when the CTCSS sub-audible tone is present.

    Processes in fixed windows of `window` samples (block length must be a
    multiple). Detection: tone bin energy must dominate both +/-10% off-tone
    bins and exceed `level` * window energy share.
    """

    def __init__(self, samp_rate: float, freq_hz: float, level: float = 0.01,
                 window: int = 400, ramp: int = 0, lead_shape: tuple = ()):
        self.samp_rate = float(samp_rate)
        self.freq = float(freq_hz)
        self.level = float(level)
        self.window = int(window)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.zeros(self.lead_shape, dtype=jnp.float32)

    def __call__(self, state, x):
        T = x.shape[-1]
        if T % self.window != 0:
            raise ValueError(f"block length {T} not a multiple of window {self.window}")
        nwin = T // self.window
        xw = x.reshape(x.shape[:-1] + (nwin, self.window))
        e_tone = _goertzel_energy(xw, self.freq, self.samp_rate)
        e_lo = _goertzel_energy(xw, self.freq * 0.9, self.samp_rate)
        e_hi = _goertzel_energy(xw, self.freq * 1.1, self.samp_rate)
        e_tot = jnp.sum(xw * xw, axis=-1) + 1e-12
        detected = ((e_tone > e_lo) & (e_tone > e_hi)
                    & (e_tone > self.level * e_tot * self.window / 2.0))
        gate = detected.astype(jnp.float32)
        # hold gate from previous window across the first window (latency 1 win)
        gate_held = jnp.concatenate([state[..., None], gate[..., :-1]], axis=-1)
        y = (xw * gate_held[..., None]).reshape(x.shape)
        return gate[..., -1], y
