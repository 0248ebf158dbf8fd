"""Polyphase rational resampler (streaming).

Equivalent of gr::filter::rational_resampler used at the head of every
reference chain (e.g. reference src/gr/gr_demod_nbfm.cpp resamples 1 Msps
-> 20 ksps with 1/50, src/gr/gr_mod_m17.cpp interpolates 24k -> 1M with
125/3). Implemented as L phase-split strided convolutions — each phase is a
VALID conv with stride M, which XLA lowers to MXU-friendly convolution; no
zero-stuffing is materialized.

Math: y[m] = sum_k h[p_m + L*k] * x[floor(m*M/L) - k],  p_m = (m*M) mod L.
Grouping outputs by residue r = m mod L gives per-class strided FIRs:
  y[r::L][t] = sum_k h_r[k] * x[t*M + q_r - k],  q_r = floor(r*M/L),
with h_r = h[p_r::L]. Streaming requires block length T % M == 0; then each
block yields T*L/M outputs and the phase pattern repeats exactly.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import conv1d_valid


def design_resampler_taps(interpolation: int, decimation: int,
                          fractional_bw: float = 0.4) -> np.ndarray:
    """Default anti-alias/anti-image filter for L/M resampling.

    Kaiser(beta=7) low-pass at the tighter of the input/output Nyquist,
    mirroring the rational_resampler default design semantics.
    """
    if not 0 < fractional_bw < 0.5:
        raise ValueError("fractional_bw must be in (0, 0.5)")
    beta = 7.0
    halfband = 0.5
    rate = interpolation / decimation
    if rate >= 1.0:
        trans_width = halfband - fractional_bw
        mid = halfband - trans_width / 2.0
    else:
        trans_width = rate * (halfband - fractional_bw)
        mid = rate * halfband - trans_width / 2.0
    return kaiser_low_pass(interpolation, interpolation, mid, trans_width, beta)


def kaiser_low_pass(gain: float, samp_rate: float, cutoff: float,
                    transition_width: float, beta: float = 7.0) -> np.ndarray:
    """Windowed-sinc low-pass with a Kaiser window."""
    att = beta / 0.1102 + 8.7  # invert beta = 0.1102 (att - 8.7)
    df = transition_width / samp_rate
    ntaps = int((att - 7.95) / (2.285 * 2 * np.pi * df)) + 1
    ntaps |= 1
    m = (ntaps - 1) / 2.0
    n = np.arange(ntaps, dtype=np.float64)
    w = np.i0(beta * np.sqrt(np.clip(1.0 - ((n - m) / m) ** 2, 0.0, 1.0))) / np.i0(beta)
    fc = cutoff / samp_rate
    h = 2.0 * fc * np.sinc(2.0 * fc * (n - m)) * w
    h *= gain / np.sum(h)
    return h.astype(np.float32)


class RationalResampler(Block):
    """Streaming polyphase L/M resampler.

    State: last (Kp-1) input samples (Kp = per-phase tap count).
    Requires each processed block length T to satisfy T % M == 0.
    """

    def __init__(self, interpolation: int, decimation: int, taps=None,
                 fractional_bw: float = 0.4, lead_shape: tuple = ()):
        g = math.gcd(int(interpolation), int(decimation))
        self.L = int(interpolation) // g
        self.M = int(decimation) // g
        if taps is None:
            taps = design_resampler_taps(self.L, self.M, fractional_bw)
        taps = np.asarray(taps)
        self.complex_taps = np.iscomplexobj(taps)
        # pad taps to a multiple of L and split into L phases
        kp = -(-taps.shape[0] // self.L)  # ceil
        padded = np.zeros(kp * self.L, dtype=taps.dtype)
        padded[: taps.shape[0]] = taps
        self.kp = kp
        self.lead_shape = tuple(lead_shape)
        # phase-r taps: h[p_r::L] with p_r = (r*M) mod L ; offsets q_r = floor(r*M/L)
        self.phase_taps = []
        self.offsets = []
        for r in range(self.L):
            p = (r * self.M) % self.L
            self.phase_taps.append(jnp.asarray(padded[p::self.L]))
            self.offsets.append((r * self.M) // self.L)

    def init_state(self):
        # f32 (re, im) tail planes — no complex64 in the hot path (the
        # axon TPU pays a multi-ms shim per complex op; see core.IqPair)
        return jnp.zeros(self.lead_shape + (2, self.kp - 1), jnp.float32)

    def _call_pair(self, state, x):
        """IqPair path: decimating head with zero complex64 ops.

        L == 1 real-taps (every 1 Msps chain head) rides the concat-free
        Pallas banded kernel; anything else falls back to plane-wise jnp.
        Output is an IqPair at the decimated rate."""
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.ops import pallas_fir

        T = x.shape[-1]
        if T % self.M != 0:
            raise ValueError(
                f"block length {T} not a multiple of decimation {self.M}")
        kp = self.kp
        tail_re = state[..., 0, :]
        tail_im = state[..., 1, :]
        n_out = T // self.M * self.L
        if self.L == 1 and not self.complex_taps:
            taps = self.phase_taps[0]
            res = pallas_fir.banded_fir_stream(
                (tail_re, tail_im), (x.re, x.im), taps, self.M, n_out)
            if res is not None:
                (yr, yi), n_main = res
                if n_main < n_out:
                    m0 = n_main
                    start = m0 * self.M - (kp - 1)
                    ln = (n_out - 1 - m0) * self.M + kp
                    yr = jnp.concatenate([yr, conv1d_valid(
                        x.re[..., start:start + ln], taps, self.M)], axis=-1)
                    yi = jnp.concatenate([yi, conv1d_valid(
                        x.im[..., start:start + ln], taps, self.M)], axis=-1)
                new_state = jnp.stack([x.re[..., T - (kp - 1):],
                                       x.im[..., T - (kp - 1):]], axis=-2)
                return new_state, IqPair(yr, yi)
        if self.complex_taps:
            # rare (complex prototype taps): do it in the complex domain
            st, y = self.__call__(state, x.to_complex())
            return st, y
        if self.L > 1:
            # L-phase rational resampling through the stream kernel: one
            # launch per phase, the per-phase input offset q_r folded
            # into the banded matrix (extra_shift) — no shifted copies.
            # Only worth it when the plan keeps >=32 rows per tile: big
            # per-phase W matrices (e.g. D=125) force 8-row tiles that
            # starve the MXU and lose to the fused-XLA plane path
            # (measured 15.0 vs 12.2 ms/step on the 128ch DMR-FF chain).
            lead_n = int(np.prod(x.shape[:-1], dtype=np.int64)) \
                if x.ndim > 1 else 1
            plan0 = pallas_fir.stream_plan(
                lead_n, T, self.kp, self.M, 2,
                max(self.offsets[1:], default=0))
            n_pp = T // self.M
            phases = [] if (plan0 is not None and plan0[3] >= 32) else None
            for r in range(self.L if phases is not None else 0):
                res = pallas_fir.banded_fir_stream(
                    (tail_re, tail_im), (x.re, x.im),
                    self.phase_taps[r], self.M, n_pp,
                    extra_shift=self.offsets[r])
                if res is None:
                    phases = None
                    break
                (yr, yi), n_main = res
                if n_main < n_pp:
                    start = n_main * self.M + self.offsets[r] - (kp - 1)
                    ln = (n_pp - 1 - n_main) * self.M + kp
                    yr = jnp.concatenate([yr, conv1d_valid(
                        x.re[..., start:start + ln], self.phase_taps[r],
                        self.M)], axis=-1)
                    yi = jnp.concatenate([yi, conv1d_valid(
                        x.im[..., start:start + ln], self.phase_taps[r],
                        self.M)], axis=-1)
                phases.append((yr, yi))
            if phases is not None:
                yr = jnp.stack([p[0] for p in phases], axis=-1).reshape(
                    x.shape[:-1] + (n_pp * self.L,))
                yi = jnp.stack([p[1] for p in phases], axis=-1).reshape(
                    x.shape[:-1] + (n_pp * self.L,))
                new_state = jnp.stack([x.re[..., T - (kp - 1):],
                                       x.im[..., T - (kp - 1):]], axis=-2)
                return new_state, IqPair(yr, yi)
        xc_re = jnp.concatenate([tail_re, x.re], axis=-1)
        xc_im = jnp.concatenate([tail_im, x.im], axis=-1)
        yr = self._phases(xc_re, T)
        yi = self._phases(xc_im, T)
        new_state = jnp.stack([xc_re[..., T:], xc_im[..., T:]], axis=-2)
        return new_state, IqPair(yr, yi)

    def _phases(self, xc, T):
        """Polyphase output for one plane of a tail+block concat."""
        n_out_per_phase = T // self.M
        ys = []
        for r in range(self.L):
            # windows end at xc index (Kp-1) + q_r + t*M ; conv1d_valid with
            # stride M over xc sliced from q_r yields exactly those outputs.
            seg = xc[..., self.offsets[r]: self.offsets[r] + (self.kp - 1) + T
                     - (self.M - 1)]
            yr = conv1d_valid(seg, self.phase_taps[r], stride=self.M)
            ys.append(yr[..., :n_out_per_phase])
        if self.L == 1:
            return ys[0]
        return jnp.stack(ys, axis=-1).reshape(
            xc.shape[:-1] + (n_out_per_phase * self.L,))

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        if isinstance(x, IqPair):
            return self._call_pair(state, x)
        T = x.shape[-1]
        if T % self.M != 0:
            raise ValueError(f"block length {T} not a multiple of decimation {self.M}")
        tail_re = state[..., 0, :]
        if not jnp.iscomplexobj(x):
            tail_x = tail_re.astype(x.dtype)
        else:
            import jax.lax as lax
            tail_x = lax.complex(tail_re, state[..., 1, :])
        parts = [tail_x, x]
        t_in = T + self.kp - 1
        n_out_per_phase = T // self.M
        if self.L == 1 and not self.complex_taps:
            # pad inside the same concat so the decimating head can run
            # on the Pallas banded kernel copy-free (ops/pallas_fir.py)
            from qradiolink_tpu.ops import pallas_fir
            lead = int(np.prod(x.shape[:-1], dtype=np.int64)) if x.ndim > 1 else 1
            pad = pallas_fir.extra_pad(lead, t_in, self.kp, self.M,
                                       jnp.iscomplexobj(x))
            if pad:
                parts.append(jnp.zeros(x.shape[:-1] + (pad,), x.dtype))
        xc = jnp.concatenate(parts, axis=-1)
        if self.L == 1 and not self.complex_taps:
            y = conv1d_valid(xc, self.phase_taps[0], stride=self.M,
                             out_len=n_out_per_phase)
        else:
            y = self._phases(xc[..., :t_in], T)
        new_tail = xc[..., t_in - (self.kp - 1): t_in]
        if jnp.iscomplexobj(new_tail):
            new_state = jnp.stack([new_tail.real, new_tail.imag], axis=-2)
        else:
            new_tail = new_tail.astype(jnp.float32)
            new_state = jnp.stack([new_tail, jnp.zeros_like(new_tail)],
                                  axis=-2)
        return new_state, y
