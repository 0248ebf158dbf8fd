"""Analog-domain demod/mod math: quadrature demod, frequency/phase
modulators, pre/de-emphasis, DC blocker, magnitude/real extraction.

These are the vectorizable single-sample ops the reference takes from
gr::analog (quadrature_demod_cc in every FM-family chain, frequency_modulator
in every FSK/FM TX chain, fm_deemph/fm_preemph in NBFM, the [1,-1]/[1,-0.9999]
DC-block IIR in AM: reference src/gr/gr_demod_am.cpp:30-83).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Stateless
from qradiolink_tpu.ops.iir import FirstOrderIir


class QuadratureDemod(Block):
    """y[n] = gain * arg(x[n] * conj(x[n-1])). State: previous sample,
    stored as f32 (re, im) planes (complex64 ops are pathologically slow
    on the axon TPU; see core.IqPair). Accepts complex or IqPair input —
    the IqPair path is entirely real arithmetic."""

    def __init__(self, gain: float, lead_shape: tuple = ()):
        self.gain = float(gain)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        re = jnp.ones(self.lead_shape + (1,), jnp.float32)
        im = jnp.zeros(self.lead_shape + (1,), jnp.float32)
        return jnp.stack([re, im], axis=-2)

    @staticmethod
    def _angle(p, q, gain):
        # guard squelched (exact zero) samples: arctan2(0, -0.0) == pi.
        # Double-where so the zero branch also has a finite gradient
        # (jnp.where alone still propagates NaN cotangents from arctan2
        # at the origin).
        nz = p * p + q * q > 0
        ang = jnp.arctan2(jnp.where(nz, q, 0.0), jnp.where(nz, p, 1.0))
        return gain * jnp.where(nz, ang, 0.0)

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            re = jnp.concatenate([state[..., 0, :], x.re], axis=-1)
            im = jnp.concatenate([state[..., 1, :], x.im], axis=-1)
            # d = x[n] * conj(x[n-1])
            p = re[..., 1:] * re[..., :-1] + im[..., 1:] * im[..., :-1]
            q = im[..., 1:] * re[..., :-1] - re[..., 1:] * im[..., :-1]
            y = self._angle(p, q, self.gain)
            new_state = jnp.stack([re[..., -1:], im[..., -1:]], axis=-2)
            return new_state, y
        prev = jax.lax.complex(state[..., 0, :], state[..., 1, :])
        xc = jnp.concatenate([prev, x], axis=-1)
        d = xc[..., 1:] * jnp.conj(xc[..., :-1])
        y = self._angle(d.real, d.imag, self.gain)
        last = xc[..., -1:]
        new_state = jnp.stack([last.real, last.imag], axis=-2)
        return new_state, y


class FrequencyMod(Block):
    """y[n] = exp(j * sensitivity * cumsum(x)). State: carried phase.

    pair_out=True emits core.IqPair(cos, sin) instead of complex64 —
    the complex-free TX form (see core.IqPair)."""

    def __init__(self, sensitivity: float, lead_shape: tuple = (),
                 pair_out: bool = False):
        self.sensitivity = float(sensitivity)
        self.lead_shape = tuple(lead_shape)
        self.pair_out = bool(pair_out)

    def init_state(self):
        return jnp.zeros(self.lead_shape, dtype=jnp.float32)

    def __call__(self, state, x):
        ph = state[..., None] + jnp.cumsum(
            x.astype(jnp.float32) * self.sensitivity, axis=-1)
        new_phase = jnp.mod(ph[..., -1], 2.0 * np.pi)
        if self.pair_out:
            from qradiolink_tpu.core import IqPair
            return new_phase, IqPair(jnp.cos(ph), jnp.sin(ph))
        y = jnp.exp(1j * ph).astype(jnp.complex64)
        return new_phase, y


class PhaseMod(Stateless):
    """y[n] = exp(j * sensitivity * x[n]) (gr::analog::phase_modulator)."""

    def __init__(self, sensitivity: float):
        self.sensitivity = float(sensitivity)

    def apply(self, x):
        ph = (x * self.sensitivity).astype(jnp.float32)
        return jnp.exp(1j * ph).astype(jnp.complex64)


class ComplexToMag(Stateless):
    def __init__(self, squared: bool = False):
        self.squared = squared

    def apply(self, x):
        p = x.real * x.real + x.imag * x.imag
        return p if self.squared else jnp.sqrt(p)


class ComplexToReal(Stateless):
    def apply(self, x):
        return x.real


class Scale(Stateless):
    def __init__(self, k):
        self.k = k

    def apply(self, x):
        return x * self.k


def fm_deemph_taps(samp_rate: float, tau: float = 50e-6):
    """Single-pole de-emphasis via bilinear transform: returns (b, a1).

    H(s) = 1/(1 + s*tau)  ->  y[n] = a1*y[n-1] + b0*x[n] + b1*x[n-1].
    """
    w_c = 1.0 / tau
    w_ca = 2.0 * samp_rate * np.tan(w_c / (2.0 * samp_rate))
    k = -w_ca / (2.0 * samp_rate)
    z1 = -1.0
    p1 = (1.0 + k) / (1.0 - k)
    b0 = -k / (1.0 - k)
    return np.array([b0, b0 * -z1]), p1


def fm_preemph_taps(samp_rate: float, tau: float = 50e-6, fh: float = -1.0):
    """Pre-emphasis: high-shelf inverse of the de-emphasis pole, corner-limited.

    Returns (b, a1) for y[n] = a1*y[n-1] + b0*x[n] + b1*x[n-1].
    """
    if fh <= 0.0 or fh >= samp_rate / 2.0:
        fh = 0.925 * samp_rate / 2.0
    ca = 2.0 * samp_rate * np.tan(np.pi * fh / samp_rate)  # upper corner (rad/s)
    cz = 1.0 / tau  # zero at the emphasis corner
    # bilinear transform of H(s) = (1 + s/cz) / (1 + s/ca)
    k_z = 2.0 * samp_rate / cz
    k_p = 2.0 * samp_rate / ca
    b = np.array([1.0 + k_z, 1.0 - k_z]) / (1.0 + k_p)
    a1 = -(1.0 - k_p) / (1.0 + k_p)
    return b, a1


class Emphasis(Block):
    """FM pre-/de-emphasis as a 1-pole 1-zero IIR (parallel first-order scan)."""

    def __init__(self, samp_rate: float, tau: float = 50e-6, mode: str = "de",
                 lead_shape: tuple = ()):
        if mode == "de":
            b, a1 = fm_deemph_taps(samp_rate, tau)
        else:
            b, a1 = fm_preemph_taps(samp_rate, tau)
        self.iir = FirstOrderIir(b0=b[0], b1=b[1], a1=a1, lead_shape=lead_shape)

    def init_state(self):
        return self.iir.init_state()

    def __call__(self, state, x):
        return self.iir(state, x)


class DcBlocker(Block):
    """y[n] = x[n] - x[n-1] + p*y[n-1], the AM chain's IIR [1,-1]/[1,-p]."""

    def __init__(self, pole: float = 0.9999, lead_shape: tuple = ()):
        self.iir = FirstOrderIir(b0=1.0, b1=-1.0, a1=pole, lead_shape=lead_shape)

    def init_state(self):
        return self.iir.init_state()

    def __call__(self, state, x):
        return self.iir(state, x)
