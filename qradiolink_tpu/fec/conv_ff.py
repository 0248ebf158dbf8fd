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
    """Constant FMA-form branch-metric tables.

    bm_d[s'] = sum_i (e_d[s',i] ? 255 - soft_i : soft_i)
             = c_d[s'] + a_d0[s']*soft_0 + a_d1[s']*soft_1
    with a = 1-2e and c = 255*sum(e) — the exact op order the Pallas
    kernel uses, so both paths round identically for float inputs.
    Returns (a0, a1, c) with a_d (ns, n) and c (2, ns).
    """
    e0 = code.edge_out[0].astype(np.float32)
    e1 = code.edge_out[1].astype(np.float32)
    a0 = 1.0 - 2.0 * e0
    a1 = 1.0 - 2.0 * e1
    c = np.stack([255.0 * e0.sum(-1), 255.0 * e1.sum(-1)])
    # both polys tapping the oldest bit makes the hi edge the exact
    # complement: bm1 = 255*n - bm0 (one fewer FMA chain; the Pallas
    # kernel exploits the same identity, keeping the paths bit-identical)
    flip = bool(np.all(e1 == 1.0 - e0))
    return a0, a1, c, flip


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


def _acs_step(code, pm, soft_t, a0, a1, c, flip=False):
    """One vectorized ACS step without gather.

    pm: (..., ns); soft_t: (..., n) in [0,255].
    Returns (new_pm, dec) with dec (..., ns) in {0.,1.} (1 = hi pred won).

    No per-step normalization: metrics grow by <= 510 per step, so a
    tile's worth (steps*510 << 2^24) stays exactly representable for
    integer soft inputs; a single normalization happens at end-state
    selection. This keeps the ACS loop 4 ops shorter and matches the
    Pallas kernel op-for-op.
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
    bm0 = c[0]
    for i in range(code.n):
        bm0 = bm0 + a0[:, i] * soft_t[..., i:i + 1]   # (..., ns)
    cand0 = lo + bm0
    if flip:
        cand1 = (hi - bm0) + 255.0 * code.n
    else:
        bm1 = c[1]
        for i in range(code.n):
            bm1 = bm1 + a1[:, i] * soft_t[..., i:i + 1]
        cand1 = hi + bm1
    dec = (cand1 < cand0).astype(jnp.float32)
    new_pm = jnp.minimum(cand0, cand1)
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
    a0, a1, c, flip = _edge_metric_tables(code)
    a0 = jnp.asarray(a0)
    a1 = jnp.asarray(a1)
    c = jnp.asarray(c)
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
        # min_rows=1: measured on-chip, the single launch beats the
        # unrolled jnp path at every row count (R=32: 0.03 vs 0.49 ms
        # — the mixed-config per-group tail shape); rows are padded to
        # a full lane tile inside decode_windows either way
        bits_k = viterbi_pallas.decode_windows(code, wr, W, min_rows=1)
        if bits_k is not None:
            bits = bits_k.reshape(lead + (C, steps))[..., W: W + L]
            return bits.reshape(lead + (T,)).astype(jnp.uint8)

    pm = jnp.zeros(lead + (C, ns), jnp.float32)
    decs = []
    for t in range(steps):
        pm, dec = _acs_step(code, pm, win[..., t, :], a0, a1, c, flip)
        decs.append(dec)

    # best end state as a one-hot; exact ties resolved to the LOWEST
    # state index (deterministic, and what the Pallas kernel's masked-min
    # start-state selection produces)
    best = jnp.min(pm, axis=-1, keepdims=True)
    sidx = jnp.arange(ns, dtype=jnp.float32)
    cand_idx = jnp.where(pm == best, sidx, float(ns))
    min_idx = jnp.min(cand_idx, axis=-1, keepdims=True)
    oh = (sidx == min_idx).astype(jnp.float32)    # (..., C, ns)

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

    def __init__(self, code: ConvCode = None, chunk: int | None = None,
                 overlap: int = 32, lead_shape: tuple = ()):
        self.code = code or CCSDS_K7
        if chunk is None:
            # larger tiles amortize the 2W-overlap ACS work; on CPU the
            # jnp fallback unrolls W+L+W python steps, so keep it short
            chunk = 512 if jax.default_backend() == "tpu" else 128
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
