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
        padded = np.zeros(kp * self.M, dtype=np.float32)
        padded[: taps.shape[0]] = taps
        # branch p filter: h[p::M]
        self.branch_taps = jnp.asarray(
            np.stack([padded[p::self.M] for p in range(self.M)]))  # (M, kp)
        self.kp = kp
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        hist = jnp.zeros(self.lead_shape + (self.M - 1,), jnp.complex64)
        tails = jnp.zeros(self.lead_shape + (self.M, self.kp - 1), jnp.complex64)
        return (hist, tails)

    def __call__(self, state, x):
        hist, tails = state
        T = x.shape[-1]
        if T % self.M != 0:
            raise ValueError(f"block length {T} not a multiple of M={self.M}")
        z = jnp.concatenate([hist, x], axis=-1)  # z[i] = x[i-(M-1)]
        # u[p, t] = x[t*M - p] = z[:T].reshape(T/M, M) flipped on last axis
        u = z[..., :T].reshape(x.shape[:-1] + (T // self.M, self.M))
        u = jnp.flip(u, axis=-1)
        u = jnp.moveaxis(u, -1, -2)  # (..., M, T/M)
        uc = jnp.concatenate([tails, u], axis=-1)
        # per-branch FIR: vmap over the branch axis via batched conv
        v = _branch_fir(uc, self.branch_taps)
        # channel k demodulates +k*fs/M: y_k = sum_p e^{+2pi i k p/M} v_p,
        # i.e. an IDFT (scaled by M) across the branch axis
        y = jnp.fft.ifft(v, axis=-2) * self.M
        new_hist = z[..., z.shape[-1] - (self.M - 1):]
        new_tails = uc[..., uc.shape[-1] - (self.kp - 1):]
        return (new_hist, new_tails), y.astype(jnp.complex64)


def _branch_fir(u: jnp.ndarray, branch_taps: jnp.ndarray) -> jnp.ndarray:
    """u (..., M, Tb + kp - 1) convolved per-branch with (M, kp) taps, VALID."""
    M, kp = branch_taps.shape
    outs = []
    for p in range(M):
        outs.append(conv1d_valid(u[..., p, :], branch_taps[p]))
    return jnp.stack(outs, axis=-2)


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
        return jnp.zeros(self.lead_shape + (self.M, self.kp - 1), jnp.complex64)

    def __call__(self, state, s):
        # s: (..., M, Tm) channel streams
        w = jnp.fft.ifft(s, axis=-2) * self.M  # (..., M branches, Tm)
        wc = jnp.concatenate([state, w], axis=-1)
        out_p = _branch_fir(wc, self.branch_taps)  # (..., M, Tm)
        # y[t*M + p] = out_p[p, t]
        y = jnp.moveaxis(out_p, -2, -1)  # (..., Tm, M)
        y = y.reshape(s.shape[:-2] + (s.shape[-1] * self.M,))
        new_tails = wc[..., wc.shape[-1] - (self.kp - 1):]
        return new_tails, y.astype(jnp.complex64)
