"""Spectral probes: windowed FFT display tap and RSSI estimation.

Equivalents of the reference's rx_fft_c/rx_fft_f (reference
src/gr/rx_fft.cpp:42-185: windowed FFT, center-shifted power spectrum) and
the rssi_block probe chain (reference src/gr/rssi_block.cpp:25-50:
mag^2 -> moving_average(2000) -> single-pole IIR(0.04) -> 10log10 + cal).
Probes are pure functions over a block tap — they cost nothing unless their
outputs are actually consumed (XLA dead-code-eliminates unused taps, the
analogue of the reference's probe "valves").
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.iir import linear_recurrence


class SpectrumProbe:
    """Windowed, center-shifted power spectrum in dBFS over the last
    fft_size samples of a block (the GUI waterfall feed)."""

    def __init__(self, fft_size: int = 1024, win: str = firdes.WIN_HAMMING):
        self.fft_size = int(fft_size)
        self.window = jnp.asarray(
            firdes.window(win, self.fft_size).astype(np.float32))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        seg = x[..., -self.fft_size:] * self.window
        spec = jnp.fft.fftshift(jnp.fft.fft(seg, axis=-1), axes=-1)
        p = (spec.real**2 + spec.imag**2) / (self.fft_size**2)
        return 10.0 * jnp.log10(p + 1e-20)


def rssi_dbm(x, cal_offset_db: float = 0.0) -> jnp.ndarray:
    """Block RSSI estimate in dB(m): smoothed mean power of the filtered tap.

    Accepts complex arrays or core.IqPair (f32 planes; complex-free)."""
    from qradiolink_tpu.core import IqPair
    if isinstance(x, IqPair):
        p = jnp.mean(x.re * x.re + x.im * x.im, axis=-1)
    else:
        p = jnp.mean(x.real**2 + x.imag**2, axis=-1)
    return 10.0 * jnp.log10(p + 1e-20) + cal_offset_db


def rssi_dbm_slots(x, slot_len: int = 720,
                   cal_offset_db: float = 0.0) -> jnp.ndarray:
    """Per-burst RSSI: one dB value per slot_len-sample window (the
    reference's rssi_tag_block tags every 720-sample MMDVM burst,
    src/gr/rssi_tag_block.cpp). Trailing samples short of a full slot
    are dropped. Accepts complex arrays or core.IqPair.
    Returns (..., T // slot_len)."""
    from qradiolink_tpu.core import IqPair
    if isinstance(x, IqPair):
        pw = x.re * x.re + x.im * x.im
    else:
        pw = x.real**2 + x.imag**2
    n = (pw.shape[-1] // slot_len) * slot_len
    w = pw[..., :n].reshape(*pw.shape[:-1], n // slot_len, slot_len)
    p = jnp.mean(w, axis=-1)
    return 10.0 * jnp.log10(p + 1e-20) + cal_offset_db


class RssiProbe(Block):
    """Streaming RSSI with the reference's exact per-sample semantics
    (reference src/gr/rssi_block.cpp:25-50): mag^2 -> moving SUM over
    2000 samples (gr::blocks::moving_average_ff(2000, scale=1) — note
    scale 1, i.e. a windowed SUM whose +33 dB gain the calibration
    offset absorbs) -> per-sample single-pole IIR(alpha=0.04) ->
    10*log10 -> + cal.

    Vectorized: the windowed sum is a cumsum difference over
    [carried 1999-sample history | block]; the IIR is one first-order
    linear recurrence (parallel scan). Returns the full per-sample dB
    stream like the reference block; callers polling a probe take the
    last sample. State: (power history (avg_len-1,), iir value)."""

    def __init__(self, avg_len: int = 2000, alpha: float = 0.04,
                 cal_offset_db: float = 0.0, lead_shape: tuple = ()):
        self.avg_len = int(avg_len)
        self.alpha = float(alpha)
        self.cal = float(cal_offset_db)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return (jnp.zeros(self.lead_shape + (self.avg_len - 1,),
                          jnp.float32),
                jnp.zeros(self.lead_shape, jnp.float32))

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.ops.iir import linear_recurrence
        hist, y0 = state
        if isinstance(x, IqPair):
            p = x.re * x.re + x.im * x.im
        elif jnp.iscomplexobj(x):
            p = (x.real**2 + x.imag**2).astype(jnp.float32)
        else:
            p = (x * x).astype(jnp.float32)
        T = p.shape[-1]
        pc = jnp.concatenate([hist, p], axis=-1)  # (..., L-1+T)
        cs = jnp.cumsum(pc, axis=-1)
        # ma[t] = sum of pc[t .. t+L-1] for t in [0, T)
        L = self.avg_len
        hi = cs[..., L - 1:]
        lo = jnp.concatenate([jnp.zeros_like(cs[..., :1]),
                              cs[..., : T - 1]], axis=-1) \
            if T > 1 else jnp.zeros_like(cs[..., :1])
        ma = hi - lo
        y = linear_recurrence(jnp.asarray(1.0 - self.alpha, jnp.float32),
                              self.alpha * ma, y0)
        db = 10.0 * jnp.log10(y + 1e-20) + self.cal
        new_hist = pc[..., pc.shape[-1] - (L - 1):]
        return (new_hist, y[..., -1]), db
