"""Tiled Viterbi ACS + traceback as ONE Pallas TPU kernel.

The jnp tiled decoder (fec/conv_ff.py) unrolls W+L+W add-compare-select
steps plus L+W traceback steps as separate XLA ops; on hardware that is
~900 kernel launches per chain step and dominates the whole demod
chain's step time (measured r4: ~85% of the 4FSK 128ch HLO kernel count
came from conv_ff.py lines 78-149).  This kernel runs the entire tile
decode — ACS loop, end-state selection, one-hot traceback — inside one
launch, with path metrics living in registers/VMEM.

Layout: states ride the SUBLANE axis (ns=64 rows), tile-rows ride the
LANE axis (RT=128 per grid step).  The radix-2 trellis butterfly
(predecessors s'>>1 / s'>>1|ns/2) is two sublane-interleaving
jnp.repeat's; traceback steps are (ns, ns) x (ns, RT) matmuls against
0/1 permutation matrices (exact in any matmul precision).

Numerics are IDENTICAL to fec/conv_ff.py: same op order, f32
throughout, min/compare exact — validated bit-exact in
tests/test_pallas_kernels.py.

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

_RT = 512  # tile rows per grid step (lane dim)


def available() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def _tables(code):
    """Constant operands: (ns, 8) packed [e00 e01 e10 e11 lsb tie . .]
    and the two transposed traceback permutations (ns, ns)."""
    ns = code.num_states
    e0 = code.edge_out[0].astype(np.float32)  # (ns, n)
    e1 = code.edge_out[1].astype(np.float32)
    # FMA form of the branch metric: where(e, 255-s, s) == 255*e + (1-2e)*s
    packed = np.zeros((ns, 8), np.float32)
    packed[:, 0] = 1.0 - 2.0 * e0[:, 0]          # a00
    packed[:, 1] = 1.0 - 2.0 * e0[:, 1]          # a01
    packed[:, 2] = 1.0 - 2.0 * e1[:, 0]          # a10
    packed[:, 3] = 1.0 - 2.0 * e1[:, 1]          # a11
    packed[:, 4] = (np.arange(ns) & 1).astype(np.float32)
    packed[:, 5] = np.arange(ns).astype(np.float32) * 1e-5
    packed[:, 6] = 255.0 * (e0[:, 0] + e0[:, 1])  # c0
    packed[:, 7] = 255.0 * (e1[:, 0] + e1[:, 1])  # c1
    hi = 1 << (code.K - 2)
    P = np.zeros((2, ns, ns), np.float32)
    for s in range(ns):
        P[0, s, s >> 1] = 1.0
        P[1, s, (s >> 1) | hi] = 1.0
    return packed, P[0].T.copy(), P[1].T.copy()


def _kernel(ns, steps, keep_from, s0_ref, s1_ref, tab_ref, p0_ref, p1_ref,
            bits_ref, dec_ref):
    half = ns // 2
    a00 = tab_ref[:, 0:1]
    a01 = tab_ref[:, 1:2]
    a10 = tab_ref[:, 2:3]
    a11 = tab_ref[:, 3:4]
    lsb = tab_ref[:, 4:5]
    tie = tab_ref[:, 5:6]
    c0 = tab_ref[:, 6:7]
    c1 = tab_ref[:, 7:8]

    def acs(t, pm):
        s0 = s0_ref[pl.ds(t, 1), :]  # (1, RT)
        s1 = s1_ref[pl.ds(t, 1), :]
        bm0 = c0 + a00 * s0 + a01 * s1
        bm1 = c1 + a10 * s0 + a11 * s1
        lo = jnp.repeat(pm[:half], 2, axis=0)
        hi = jnp.repeat(pm[half:], 2, axis=0)
        cand0 = lo + bm0
        cand1 = hi + bm1
        dec = (cand1 < cand0)
        pm = jnp.minimum(cand0, cand1)
        pm = pm - jnp.min(pm, axis=0, keepdims=True)
        dec_ref[pl.ds(t, 1)] = dec[None].astype(jnp.int8)
        return pm

    pm = jnp.zeros((ns, bits_ref.shape[-1]), jnp.float32)
    pm = lax.fori_loop(0, steps, acs, pm)

    pmt = pm + tie
    best = jnp.min(pmt, axis=0, keepdims=True)
    oh = (pmt == best).astype(jnp.float32)

    def tb(k, oh):
        t = steps - 1 - k
        bit = jnp.sum(oh * lsb, axis=0, keepdims=True)  # (1, RT)
        bits_ref[pl.ds(t, 1), :] = bit
        dec_t = dec_ref[pl.ds(t, 1)][0].astype(jnp.float32)
        d = jnp.sum(oh * dec_t, axis=0, keepdims=True)
        pred0 = lax.dot_general(p0_ref[:, :], oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pred1 = lax.dot_general(p1_ref[:, :], oh, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (1.0 - d) * pred0 + d * pred1

    # traceback down to keep_from (earlier bits are warmup, never read)
    lax.fori_loop(0, steps - keep_from, tb, oh)


def decode_windows(code, win: jax.Array, keep_from: int) -> jax.Array:
    """win: (R, S, 2) f32 soft windows (R tile-rows) -> bits (R, S) f32
    (rows < keep_from undefined). Returns None if not servable."""
    if not available():
        return None
    ns = code.num_states
    if code.n != 2 or ns < 8 or ns % 2:
        return None
    R, S, _ = win.shape
    if R < _RT:
        return None
    packed, p0t, p1t = _tables(code)
    rp = -(-R // _RT) * _RT
    wk = jnp.transpose(win, (1, 2, 0))  # (S, 2, R)
    if rp != R:
        wk = jnp.pad(wk, ((0, 0), (0, 0), (0, rp - R)))
    s0 = wk[:, 0]
    s1 = wk[:, 1]
    kern = functools.partial(_kernel, ns, S, keep_from)
    bits = pl.pallas_call(
        kern,
        grid=(rp // _RT,),
        in_specs=[
            pl.BlockSpec((S, _RT), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, _RT), lambda r: (0, r), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, 8), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, ns), lambda r: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ns, ns), lambda r: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((S, _RT), lambda r: (0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, rp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((S, ns, _RT), jnp.int8)],
    )(s0, s1, jnp.asarray(packed), jnp.asarray(p0t), jnp.asarray(p1t))
    return jnp.transpose(bits[:, :R], (1, 0))  # (R, S)
