"""Polyphase filter-bank channelizer and synthesizer.

The reference's multi-carrier MMDVM path splits a 250 ksps stream into 10
channels at 25 kHz spacing with gr::filter::pfb_channelizer_ccf and
recombines TX with pfb_synthesizer_ccf (reference
src/gr/gr_demod_mmdvm_multi2.cpp:98-135, gr_mod_mmdvm_multi2.cpp:91-127).

Here both are derived from first principles as (reshape -> per-branch FIR ->
FFT across branches), which XLA fuses into a handful of convolutions plus a
batched small FFT — and the channel axis that falls out is exactly the axis
the framework shards across devices.

Channelizer math (critically sampled, M channels):
  y_k[m] = sum_p exp(+2pi i k p / M) * v_p[m],
  v_p[m] = sum_l h[p + M l] * x[(m-l) M - p]
so channel k (centered at +k*fs/M, k mod M) is an IDFT across the M branch
filter outputs. Synthesizer is the exact adjoint: IDFT across channels ->
branch filters g[p::M] -> commutate branches into the output stream.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.ops.fir import conv1d_valid
from qradiolink_tpu.ops.resample import kaiser_low_pass


def default_channelizer_taps(num_channels: int, taps_per_branch: int = 32,
                             excess_bw: float = 0.2) -> np.ndarray:
    """Prototype low-pass: cutoff at the channel half-width."""
    fs = float(num_channels)
    return kaiser_low_pass(1.0, fs, 0.5, excess_bw, beta=7.0)[
        : num_channels * taps_per_branch]


class PfbChannelizer(Block):
    """x (..., T) at fs -> (..., M, T/M) channels at fs/M.

    Channel k is centered at +k*fs/M (k >= M/2 alias to negative freqs).
    Block length T must be a multiple of M. State: per-branch FIR tails plus
    the M-1 input-sample history needed for the branch commutation.
    """

    def __init__(self, num_channels: int, taps=None, lead_shape: tuple = ()):
        self.M = int(num_channels)
        if taps is None:
            taps = default_channelizer_taps(self.M)
        taps = np.asarray(taps, dtype=np.float32)
        kp = -(-taps.shape[0] // self.M)
        kp = -(-kp // 8) * 8  # sublane-align for the fused Pallas kernel
        padded = np.zeros(kp * self.M, dtype=np.float32)
        padded[: taps.shape[0]] = taps
        # branch p filter: h[p::M]
        bt = np.stack([padded[p::self.M] for p in range(self.M)])  # (M, kp)
        self.branch_taps = jnp.asarray(bt)
        # commutator-ordered rows: row q filters with branch p = M-1-q
        self._btq_np = bt[::-1].copy()
        self.branch_taps_q = jnp.asarray(self._btq_np)
        self.kp = kp
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        # raw input history: the last kp*M samples as f32 (re, im) planes
        # (element 0 is never read). Both the jnp path (which derives the
        # commutator hist + per-branch tails from it) and the fused Pallas
        # kernel (ops/pallas_pfb.py) consume this directly; no complex64
        # in the hot path (see core.IqPair).
        return jnp.zeros(self.lead_shape + (2, self.kp * self.M),
                         jnp.float32)

    def _split_state(self, raw_p):
        """One raw-history plane (..., kp*M) -> (hist (..., M-1),
        tails_q (..., M, kp-1)) for the commutator path.

        tails_q[q, j] = u[Tm_prev - (kp-1) + j, q] = raw[j*M + q + 1]."""
        hist = raw_p[..., -(self.M - 1):] if self.M > 1 \
            else raw_p[..., :0]
        t = raw_p[..., 1: 1 + (self.kp - 1) * self.M]
        t = t.reshape(t.shape[:-1] + (self.kp - 1, self.M))
        tails = jnp.swapaxes(t, -1, -2)
        return hist, tails

    def _commutate(self, hist_p, tails_p, xp):
        """One plane through the input commutator.

        Branch rows come out in COMMUTATOR order q (row q carries
        x[t*M + q - (M-1)], i.e. polyphase branch p = M-1-q); the flip
        that the textbook formulation applies to the whole input stream
        is folded into the branch-tap row order and the IDFT matrix
        instead — zero runtime cost on the hot path."""
        T = xp.shape[-1]
        z = jnp.concatenate([hist_p, xp], axis=-1)  # z[i] = x[i-(M-1)]
        u = z[..., :T].reshape(xp.shape[:-1] + (T // self.M, self.M))
        u = jnp.moveaxis(u, -1, -2)  # (..., M rows q, T/M)
        uc = jnp.concatenate([tails_p, u], axis=-1)
        return (z[..., z.shape[-1] - (self.M - 1):],
                uc[..., uc.shape[-1] - (self.kp - 1):], uc)

    def _plane(self, hist_p, tails_p, xp):
        new_hist, new_tails, uc = self._commutate(hist_p, tails_p, xp)
        w = _branch_fir(uc, self.branch_taps_q)  # row q = v_{M-1-q}
        return new_hist, new_tails, w

    def _branch_fir_pair(self, ucr, uci):
        """Both planes' branch FIRs in one Pallas depthwise launch when
        servable (per-row taps rule out the banded matmul; the jnp
        slice-MAC form pays kp HBM passes)."""
        from qradiolink_tpu.ops import pallas_fir
        tb = ucr.shape[-1] - (self.kp - 1)
        res = pallas_fir.depthwise_fir((ucr, uci), self._btq_np, tb)
        if res is None:
            return _branch_fir(ucr, self.branch_taps_q), \
                _branch_fir(uci, self.branch_taps_q)
        (vr, vi), n_main = res
        if n_main < tb:
            rest_r = _branch_fir(ucr[..., n_main:], self.branch_taps_q)
            rest_i = _branch_fir(uci[..., n_main:], self.branch_taps_q)
            vr = jnp.concatenate([vr, rest_r], axis=-1)
            vi = jnp.concatenate([vi, rest_i], axis=-1)
        return vr, vi

    def _idft_mats(self):
        # channel k demodulates +k*fs/M: y_k = sum_p e^{+2pi i k p/M} v_p
        # — the M-point IDFT (scaled by M) across branches, expressed as
        # two real (M, M) matmuls over the q-ordered rows so IqPair
        # planes never touch complex64
        k = np.arange(self.M)
        w = np.exp(2j * np.pi * np.outer(k, k) / self.M)
        wq = w[:, ::-1]  # column q multiplies v_{M-1-q}
        return (jnp.asarray(np.ascontiguousarray(wq.real, np.float32)),
                jnp.asarray(np.ascontiguousarray(wq.imag, np.float32)))

    def _new_raw(self, state, xr, xi):
        km = self.kp * self.M
        cat_r = jnp.concatenate([state[..., 0, :], xr], axis=-1)
        cat_i = jnp.concatenate([state[..., 1, :], xi], axis=-1)
        return jnp.stack([cat_r[..., -km:], cat_i[..., -km:]], axis=-2)

    def _jnp_pair(self, state, xr, xi):
        """IqPair jnp path from raw history planes."""
        wr, wi = self._idft_mats()
        hist_r, tails_r = self._split_state(state[..., 0, :])
        hist_i, tails_i = self._split_state(state[..., 1, :])
        _, _, ucr = self._commutate(hist_r, tails_r, xr)
        _, _, uci = self._commutate(hist_i, tails_i, xi)
        vr, vi = self._branch_fir_pair(ucr, uci)
        yr = jnp.einsum("kq,...qt->...kt", wr, vr) \
            - jnp.einsum("kq,...qt->...kt", wi, vi)
        yi = jnp.einsum("kq,...qt->...kt", wr, vi) \
            + jnp.einsum("kq,...qt->...kt", wi, vr)
        return yr, yi

    def __call__(self, state, x):
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.ops import pallas_pfb
        T = x.shape[-1]
        if T % self.M != 0:
            raise ValueError(f"block length {T} not a multiple of M={self.M}")
        if isinstance(x, IqPair):
            new_state = self._new_raw(state, x.re, x.im)
            res = None
            if pallas_pfb.ENABLED:
                res = pallas_pfb.channelize((x.re, x.im), state,
                                            self._btq_np, self.M, self.kp)
            if res is not None:
                (yr, yi), n_main = res
                tm = T // self.M
                if n_main < tm:
                    # remainder rows from a mid-block raw-history slice
                    cut = n_main * self.M
                    mid = self._new_raw(state, x.re[..., :cut],
                                        x.im[..., :cut])
                    yr2, yi2 = self._jnp_pair(mid, x.re[..., cut:],
                                              x.im[..., cut:])
                    yr = jnp.concatenate([yr, yr2], axis=-1)
                    yi = jnp.concatenate([yi, yi2], axis=-1)
                return new_state, IqPair(yr, yi)
            yr, yi = self._jnp_pair(state, x.re, x.im)
            return new_state, IqPair(yr, yi)
        # complex64 path (CPU tests / offline)
        hist_r, tails_r = self._split_state(state[..., 0, :])
        hist_i, tails_i = self._split_state(state[..., 1, :])
        hist_c = jax.lax.complex(hist_r, hist_i)
        tails_c = jax.lax.complex(tails_r, tails_i)
        _, _, w = self._plane(hist_c, tails_c, x)
        v = jnp.flip(w, axis=-2)  # back to polyphase order p for the fft
        y = jnp.fft.ifft(v, axis=-2) * self.M
        new_state = self._new_raw(state, x.real, x.imag)
        return new_state, y.astype(jnp.complex64)


def _branch_fir(u: jnp.ndarray, branch_taps: jnp.ndarray) -> jnp.ndarray:
    """u (..., M, Tb + kp - 1) convolved per-branch with (M, kp) taps,
    VALID — as kp batched slice-MAC terms over the whole (M, Tb) slab
    (one fused elementwise loop) instead of M separate convolutions
    (which cost M kernel launches each on this backend)."""
    M, kp = branch_taps.shape
    tb = u.shape[-1] - (kp - 1)
    tf = branch_taps[:, ::-1]  # conv flips taps
    acc = None
    for k in range(kp):
        term = u[..., :, k:k + tb] * tf[:, k][..., :, None]
        acc = term if acc is None else acc + term
    return acc


class PfbSynthesizer(Block):
    """Channels (..., M, Tm) at fs/M -> (..., M*Tm) stream at fs."""

    def __init__(self, num_channels: int, taps=None, lead_shape: tuple = ()):
        self.M = int(num_channels)
        if taps is None:
            taps = default_channelizer_taps(self.M)
            taps = taps * self.M  # interpolation gain
        taps = np.asarray(taps, dtype=np.float32)
        kp = -(-taps.shape[0] // self.M)
        padded = np.zeros(kp * self.M, dtype=np.float32)
        padded[: taps.shape[0]] = taps
        self.branch_taps = jnp.asarray(
            np.stack([padded[p::self.M] for p in range(self.M)]))
        self.kp = kp
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        # f32 (re, im) planes, like the channelizer (see core.IqPair)
        return jnp.zeros(self.lead_shape + (2, self.M, self.kp - 1),
                         jnp.float32)

    def _idft_mats(self):
        # w_p = sum_k s_k e^{+2pi i p k / M}  (ifft * M across channels)
        k = np.arange(self.M)
        w = np.exp(2j * np.pi * np.outer(k, k) / self.M)
        return (jnp.asarray(w.real.astype(np.float32)),
                jnp.asarray(w.imag.astype(np.float32)))

    @staticmethod
    def _commutate_out(out_p, M):
        # y[t*M + p] = out_p[p, t]
        y = jnp.moveaxis(out_p, -2, -1)  # (..., Tm, M)
        return y.reshape(out_p.shape[:-2] + (out_p.shape[-1] * M,))

    def __call__(self, state, s):
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.ops import pallas_fir
        if isinstance(s, IqPair):
            wr_m, wi_m = self._idft_mats()
            wre = jnp.einsum("pk,...kt->...pt", wr_m, s.re) \
                - jnp.einsum("pk,...kt->...pt", wi_m, s.im)
            wim = jnp.einsum("pk,...kt->...pt", wr_m, s.im) \
                + jnp.einsum("pk,...kt->...pt", wi_m, s.re)
            wcr = jnp.concatenate([state[..., 0, :, :], wre], axis=-1)
            wci = jnp.concatenate([state[..., 1, :, :], wim], axis=-1)
            tb = s.shape[-1]
            res = pallas_fir.depthwise_fir((wcr, wci),
                                           np.asarray(self.branch_taps), tb)
            if res is None:
                vr = _branch_fir(wcr, self.branch_taps)
                vi = _branch_fir(wci, self.branch_taps)
            else:
                (vr, vi), n_main = res
                if n_main < tb:
                    vr = jnp.concatenate(
                        [vr, _branch_fir(wcr[..., n_main:],
                                         self.branch_taps)], axis=-1)
                    vi = jnp.concatenate(
                        [vi, _branch_fir(wci[..., n_main:],
                                         self.branch_taps)], axis=-1)
            y = IqPair(self._commutate_out(vr, self.M),
                       self._commutate_out(vi, self.M))
            new_state = jnp.stack([wcr[..., wcr.shape[-1] - (self.kp - 1):],
                                   wci[..., wci.shape[-1] - (self.kp - 1):]],
                                  axis=-3)
            return new_state, y
        # s: (..., M, Tm) complex channel streams
        tails_c = jax.lax.complex(state[..., 0, :, :], state[..., 1, :, :])
        w = jnp.fft.ifft(s, axis=-2) * self.M  # (..., M branches, Tm)
        wc = jnp.concatenate([tails_c, w], axis=-1)
        out_p = _branch_fir(wc, self.branch_taps)  # (..., M, Tm)
        y = self._commutate_out(out_p, self.M)
        new_tails = wc[..., wc.shape[-1] - (self.kp - 1):]
        new_state = jnp.stack([new_tails.real, new_tails.imag], axis=-3)
        return new_state, y.astype(jnp.complex64)
