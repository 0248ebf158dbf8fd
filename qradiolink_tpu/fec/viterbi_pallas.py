"""Tiled Viterbi ACS + traceback as ONE Pallas TPU kernel.

The jnp tiled decoder (fec/conv_ff.py) unrolls W+L+W add-compare-select
steps plus L+W traceback steps as separate XLA ops; on hardware that is
~900 kernel launches per chain step. This kernel runs the entire tile
decode inside one launch, and its round-5 formulation attacks the two
throughput sinks of the round-4 kernel (which ran at ~0.77 ms on the
128x4000 bench line):

  * NO per-step metric normalization. Branch metrics are <= 510 per
    step, so tile metrics stay far below 2^24 and f32 arithmetic is
    exact for integer soft inputs; one normalization happens at
    end-state selection. Removes the only cross-sublane reduce (and 4
    VPU passes) from every ACS step. The jnp path does the same, so the
    two stay op-for-op identical.
  * Survivor decisions are BIT-PACKED ACROSS STATES into two i32 words
    per step ((S, 2, RT) instead of an (S, 64, RT) byte cube), and the
    traceback walks a SCALAR state per column: two (1, RT) word reads, a
    variable right-shift, and a state update — ~64x less traceback
    traffic than the round-4 one-hot matmul walk.

Layout: states ride the SUBLANE axis (ns=64 rows), tile-rows ride the
LANE axis (RT up to 2048 per grid step). End-state ties resolve to the
lowest state index via a masked min — deterministic, matching
conv_ff.viterbi_decode_tiled exactly (validated bit-exact in
tests/test_pallas_kernels.py).

Reference semantics: gr::fec cc_decoder CCSDS K=7 {109, 79}
(/root/reference/src/gr/gr_demod_4fsk.cpp digital tail; SURVEY §2.2).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_VMEM_BUDGET = 11 * 1024 * 1024


def available() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _tables(code):
    """Constant operands (all numpy so they can be cached across traces):

    tabf (ns, 8) f32: [a00 a01 a10 a11 c0 c1 lsb sidx]
    tabi (ns, 8) i32: [pw2 . . . . . . .]  pw2 = 1 << (s % 32)
    """
    ns = code.num_states
    e0 = code.edge_out[0].astype(np.float32)  # (ns, n)
    e1 = code.edge_out[1].astype(np.float32)
    tabf = np.zeros((ns, 8), np.float32)
    tabf[:, 0] = 1.0 - 2.0 * e0[:, 0]
    tabf[:, 1] = 1.0 - 2.0 * e0[:, 1]
    tabf[:, 2] = 1.0 - 2.0 * e1[:, 0]
    tabf[:, 3] = 1.0 - 2.0 * e1[:, 1]
    tabf[:, 4] = 255.0 * (e0[:, 0] + e0[:, 1])
    tabf[:, 5] = 255.0 * (e1[:, 0] + e1[:, 1])
    tabf[:, 6] = (np.arange(ns) & 1).astype(np.float32)
    tabf[:, 7] = np.arange(ns).astype(np.float32)
    tabi = np.zeros((ns, 8), np.int32)
    tabi[:, 0] = (1 << (np.arange(ns) % 32)).astype(np.int32)
    # when both generator polynomials tap the oldest bit (CCSDS does),
    # the hi-predecessor edge outputs are the complement of the lo edge:
    # bm1 = 510 - bm0, saving one branch-metric FMA chain per ACS step
    flip = bool(np.all(e1 == 1.0 - e0))
    return tabf, tabi, flip


def _kernel(ns, steps, keep_from, hi_bit, flip, s0_ref, s1_ref, tf_ref,
            ti_ref, bits_ref, dec_ref):
    half = ns // 2
    a00 = tf_ref[:, 0:1]
    a01 = tf_ref[:, 1:2]
    a10 = tf_ref[:, 2:3]
    a11 = tf_ref[:, 3:4]
    c0 = tf_ref[:, 4:5]
    c1 = tf_ref[:, 5:6]
    sidx = tf_ref[:, 7:8]
    pw2 = ti_ref[:, 0:1]
    rt = s0_ref.shape[-1]

    def acs(t, pm):
        s0 = s0_ref[pl.ds(t, 1), :]  # (1, RT)
        s1 = s1_ref[pl.ds(t, 1), :]
        bm0 = c0 + a00 * s0 + a01 * s1
        lo = jnp.repeat(pm[:half], 2, axis=0)
        hi = jnp.repeat(pm[half:], 2, axis=0)
        cand0 = lo + bm0
        if flip:
            cand1 = (hi - bm0) + 510.0
        else:
            cand1 = hi + (c1 + a10 * s0 + a11 * s1)
        # pack decisions across states into two i32 words per step
        di = jnp.where(cand1 < cand0, pw2, 0)
        pm = jnp.minimum(cand0, cand1)
        dec_ref[pl.ds(t, 1), 0, :] = jnp.sum(di[:half], axis=0,
                                             keepdims=True)
        dec_ref[pl.ds(t, 1), 1, :] = jnp.sum(di[half:], axis=0,
                                             keepdims=True)
        return pm

    pm = jnp.zeros((ns, rt), jnp.float32)
    pm = lax.fori_loop(0, steps, acs, pm)

    # end state: lowest state index among metric minima (exact-tie safe)
    best = jnp.min(pm, axis=0, keepdims=True)
    cand_idx = jnp.where(pm == best, sidx, float(ns))
    s = jnp.min(cand_idx, axis=0, keepdims=True).astype(jnp.int32)  # (1,RT)

    # scalar-state traceback: (1, RT) rows only
    def tb(k, s):
        t = steps - 1 - k
        bits_ref[pl.ds(t, 1), :] = (s & 1).astype(jnp.float32)
        w = jnp.where(s < half, dec_ref[pl.ds(t, 1), 0, :],
                      dec_ref[pl.ds(t, 1), 1, :])
        d = lax.shift_right_logical(w, s & 31) & 1
        return lax.shift_right_logical(s, 1) | (d << hi_bit)

    lax.fori_loop(0, steps - keep_from, tb, s)


def decode_windows(code, win: jax.Array, keep_from: int,
                   min_rows: int = 256) -> jax.Array:
    """win: (R, S, 2) f32 soft windows (R tile-rows) -> bits (R, S) f32
    (rows < keep_from undefined). Returns None if not servable.

    min_rows: refuse below this many tile rows (rows are padded to a
    full 256-lane tile either way, so tiny-R launches waste lanes; the
    default keeps the historical crossover, callers that know the
    launch still beats the unrolled jnp path — e.g. TiledViterbi at
    small block sizes — pass min_rows=1)."""
    if not available():
        return None
    from qradiolink_tpu.utils.profiling import pallas_paths
    ns = code.num_states
    if code.n != 2 or ns < 8 or ns > 64 or ns % 2:
        pallas_paths.record("tiled_viterbi", False, f"code n{code.n}")
        return None
    R, S, _ = win.shape
    if R < min_rows or S * 510.0 >= 2 ** 24:
        pallas_paths.record("tiled_viterbi", False, f"R{R} S{S}")
        return None
    pallas_paths.record("tiled_viterbi", True, f"R{R} S{S}")
    tabf, tabi, flip = _tables(code)
    # pick the widest lane tile VMEM affords (dec words + windows + bits)
    rt = 2048
    while rt > 256 and (S * (2 + 2 + 1 + 2) * 4 + ns * 64) * rt \
            > _VMEM_BUDGET:
        rt //= 2
    rt = min(rt, max(256, 1 << int(np.floor(np.log2(R)))))
    rp = -(-R // rt) * rt
    wk = jnp.transpose(win, (1, 2, 0))  # (S, 2, R)
    if rp != R:
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, rp - R)))
    s0 = wk[:, 0]
    s1 = wk[:, 1]
    kern = functools.partial(_kernel, ns, S, keep_from, code.K - 2, flip)
    bits = pl.pallas_call(
        kern,
        grid=(rp // rt,),
        in_specs=[
            pl.BlockSpec((S, rt), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, rt), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 8), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 8), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, rt), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, 2, rt), jnp.int32)],
    )(s0, s1, jnp.asarray(tabf), jnp.asarray(tabi))
    return jnp.transpose(bits[:, :R], (1, 0))  # (R, S)
