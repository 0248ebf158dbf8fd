"""Tiled (block-parallel) Viterbi decoder — the TPU-native formulation.

The reference decodes with a free-running sequential Viterbi
(gr::fec cc_decoder, reference SURVEY §2.2 common digital tail); the
scan-based port in fec/conv.py mirrors that. This module instead decodes
in *overlapped tiles*: the stream is cut into C chunks of L symbols, each
extended W symbols left and right (W >= 5K is the standard truncation
depth); every chunk runs add-compare-select from uniform metrics and
traces back from its right edge, and only the middle L decisions are kept.
All C chunks process in parallel — the sequential depth is the fixed
L + 2W unrolled steps, independent of stream length.

Formulated for the axon TPU backend's primitive set (no lax.scan, no
gather, no dynamic_slice, no argmin — see ops/fir.py note):
  * the radix-2 trellis butterfly is expressed with reshapes/broadcasts
    (state s' has predecessors s'>>1 and s'>>1 | ns/2, so the
    predecessor-metric vectors are interleaved repeats of the two halves)
  * traceback carries the path state as a ONE-HOT vector; the two
    predecessor maps are constant 64x64 permutation matrices, so one
    traceback step is two matmuls blended by the survivor decision
  * the best end state is a min-compare one-hot, not argmin

Overhead vs sequential: (L + 2W) / L extra ACS work; with L=128, W=32
that is 1.5x for a >100x parallel width — the trade that makes ≥10x
real-time per chip possible.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block
from qradiolink_tpu.fec.conv import ConvCode, CCSDS_K7


def _edge_metric_tables(code: ConvCode):
    """Constant per-edge expected-output tables for branch metrics.

    Returns (e0, e1): each (ns, n) float — expected coded bits along the
    hi=0 / hi=1 predecessor edge into each state.
    """
    return (code.edge_out[0].astype(np.float32),
            code.edge_out[1].astype(np.float32))


def _perm_matrices(code: ConvCode):
    """Traceback permutation matrices P[d] (ns, ns): one-hot(s) @ P[d] =
    one-hot(pred) where pred = (s >> 1) | (d << (K-2))."""
    ns = code.num_states
    hi = 1 << (code.K - 2)
    P = np.zeros((2, ns, ns), np.float32)
    for s in range(ns):
        P[0, s, s >> 1] = 1.0
        P[1, s, (s >> 1) | hi] = 1.0
    return P


def _acs_step(code, pm, soft_t, e0, e1):
    """One vectorized ACS step without gather.

    pm: (..., ns); soft_t: (..., n) in [0,255].
    Returns (new_pm, dec) with dec (..., ns) in {0.,1.} (1 = hi pred won).
    """
    ns = code.num_states
    half = ns // 2
    # predecessor metrics: state s' has preds s'>>1 (low half of pm) and
    # s'>>1 | half (high half); over ascending s' these are the two halves
    # each repeated twice, interleaved -> broadcast + reshape
    lead = pm.shape[:-1]
    lo = jnp.broadcast_to(pm[..., :half, None], lead + (half, 2))
    lo = lo.reshape(lead + (ns,))
    hi = jnp.broadcast_to(pm[..., half:, None], lead + (half, 2))
    hi = hi.reshape(lead + (ns,))
    # branch metric: sum_i (expected ? 255 - soft : soft)
    s = soft_t[..., None, :]  # (..., 1, n)
    bm0 = jnp.sum(jnp.where(e0 > 0.5, 255.0 - s, s), axis=-1)  # (..., ns)
    bm1 = jnp.sum(jnp.where(e1 > 0.5, 255.0 - s, s), axis=-1)
    cand0 = lo + bm0
    cand1 = hi + bm1
    dec = (cand1 < cand0).astype(jnp.float32)
    new_pm = jnp.minimum(cand0, cand1)
    new_pm = new_pm - jnp.min(new_pm, axis=-1, keepdims=True)
    return new_pm, dec


def _overlap_windows(x: jax.Array, L: int, W: int):
    """(..., T, n) -> (..., C, W+L+W, n) overlapped chunk windows, built
    from three plain reshapes (no gather / dynamic slicing).
    T must be a multiple of L; out-of-range warmup regions are 128s."""
    lead = x.shape[:-2]
    T, n = x.shape[-2], x.shape[-1]
    C = T // L
    mid = x.reshape(lead + (C, L, n))
    padf = jnp.full(lead + (W, n), 128.0, x.dtype)
    if L < W:
        raise ValueError("chunk length must be >= overlap")
    # left warmup of chunk c = x[cL-W : cL]; with zl[i] = x[i-W] this is
    # zl[cL : cL+W] = the first W entries of reshaped row c
    zl = jnp.concatenate([padf, x[..., : T - W, :]], axis=-2)
    left = zl.reshape(lead + (C, L, n))[..., :W, :]
    # right warmup of chunk c = x[(c+1)L : (c+1)L+W]
    zr = jnp.concatenate([x[..., L:, :], jnp.full(lead + (L, n), 128.0,
                                                  x.dtype)], axis=-2)
    right = zr.reshape(lead + (C, L, n))[..., :W, :]
    return jnp.concatenate([left, mid, right], axis=-2)


def viterbi_decode_tiled(code: ConvCode, soft: jax.Array,
                         chunk: int = 128, overlap: int = 32) -> jax.Array:
    """soft: (..., T, n) in [0,255] -> bits (..., T) uint8.

    T must be a multiple of `chunk`. Fully feedforward: accuracy equals
    the sequential decoder except within `overlap` of the stream edges
    (validated in tests against viterbi_decode).
    """
    ns = code.num_states
    e0, e1 = _edge_metric_tables(code)
    e0 = jnp.asarray(e0)
    e1 = jnp.asarray(e1)
    P = jnp.asarray(_perm_matrices(code))
    L, W = int(chunk), int(overlap)
    lead = soft.shape[:-2]
    T = soft.shape[-2]
    win = _overlap_windows(soft.astype(jnp.float32), L, W)  # (...,C,W+L+W,n)
    C = T // L
    steps = W + L + W

    # single-launch Pallas path (bit-identical; see fec/viterbi_pallas.py)
    from qradiolink_tpu.fec import viterbi_pallas
    if viterbi_pallas.available():
        R = int(np.prod(lead, dtype=np.int64)) * C if lead else C
        wr = win.reshape((R, steps, code.n))
        bits_k = viterbi_pallas.decode_windows(code, wr, W)
        if bits_k is not None:
            bits = bits_k.reshape(lead + (C, steps))[..., W: W + L]
            return bits.reshape(lead + (T,)).astype(jnp.uint8)

    pm = jnp.zeros(lead + (C, ns), jnp.float32)
    decs = []
    for t in range(steps):
        pm, dec = _acs_step(code, pm, win[..., t, :], e0, e1)
        decs.append(dec)

    # best end state as a one-hot (min-compare; index tiebreak)
    tie = jnp.arange(ns, dtype=jnp.float32) * 1e-5
    pmt = pm + tie
    best = jnp.min(pmt, axis=-1, keepdims=True)
    oh = (pmt == best).astype(jnp.float32)        # (..., C, ns)

    state_lsb = jnp.asarray((np.arange(ns) & 1).astype(np.float32))
    bits_rev = []
    for t in range(steps - 1, W - 1, -1):
        bit = jnp.sum(oh * state_lsb, axis=-1)    # (..., C)
        if t >= W:
            bits_rev.append(bit)
        d = jnp.sum(oh * decs[t], axis=-1, keepdims=True)  # survivor choice
        oh = (1.0 - d) * (oh @ P[0]) + d * (oh @ P[1])
    # bits_rev covers t = steps-1 .. W (reverse); keep middle L decisions
    bits = jnp.stack(bits_rev[::-1], axis=-1)     # (..., C, W+L)
    bits = bits[..., :L]                          # drop right warmup
    return bits.reshape(lead + (T,)).astype(jnp.uint8)


class TiledViterbi(Block):
    """Streaming wrapper: carries W trailing soft pairs so consecutive
    blocks decode identically to one long stream (up to tile truncation,
    which is below the code's error floor for W >= 5K)."""

    def __init__(self, code: ConvCode = None, chunk: int = 128,
                 overlap: int = 32, lead_shape: tuple = ()):
        self.code = code or CCSDS_K7
        self.chunk = int(chunk)
        self.overlap = int(overlap)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.full(self.lead_shape + (self.overlap, self.code.n),
                        128.0, jnp.float32)

    def __call__(self, state, soft):
        """soft (..., T, n) -> bits (..., T): decisions for this block's
        symbols, each decoded with `overlap` symbols of left context from
        the previous block."""
        W = self.overlap
        x = jnp.concatenate([state, soft.astype(jnp.float32)], axis=-2)
        T = soft.shape[-2]
        pad = (-(T + W)) % self.chunk
        if pad:
            x = jnp.concatenate(
                [x, jnp.full(x.shape[:-2] + (pad, self.code.n), 128.0,
                             jnp.float32)], axis=-2)
        bits = viterbi_decode_tiled(self.code, x, self.chunk, W)
        new_tail = x[..., W + T - W: W + T, :]
        return new_tail, bits[..., W: W + T]
