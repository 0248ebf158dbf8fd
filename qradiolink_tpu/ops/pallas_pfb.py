"""Fused polyphase-channelizer Pallas TPU kernel.

One launch computes the ENTIRE channelizer — per-branch FIR plus the
M-point DFT across branches — for every carried stream, with one HBM read
of the (packed) input and one HBM write of the channel outputs. Replaces
the round-4 pipeline (XLA transpose -> depthwise Pallas FIR -> four jnp
einsums) that ran at 3.2% of the HBM roofline because every stage paid its
own HBM pass and the M-minor transposes/einsums defeated XLA's tiling
(reference structure: gr::filter::pfb_channelizer_ccf,
/root/reference/src/gr/gr_demod_mmdvm_multi2.cpp:98-135).

Formulation (validated in tests against the jnp path):
  view the input as x2d[t, c] = x[t*M + c].  The commutator's (M-1)-sample
  offset folds into per-COLUMN tap vectors of length kp+1 (column c
  carries polyphase branch q=(c-1) mod M, delayed one x2d row for c>=1):
      v[m, c] = sum_l ct[l, c] * x2d[m - l, c]
  which is kp+1 sublane-shifted broadcast-FMAs over a VMEM slab — time on
  the sublane axis, columns on the lane axis. The DFT across branches
  becomes a single (128, 128) matmul with a column-permuted block-diagonal
  DFT matrix:
      y[o, t] = sum_i RHS[i, o] * acc[t, i]
  issued as dot_general contracting acc's LANE axis — the MXU absorbs the
  channel-major output transpose for free, so channel outputs leave the
  kernel already in (stream, plane, channel, time) layout.

Lane packing: Mosaic cannot lane-slice VMEM/HBM refs at sub-128 widths,
and arrays with minor dims < 128 get lane-padded 128/M-fold in TPU memory,
so the caller packs the input ONCE in XLA (one fused pass) into
(n_bg, kp + tseg, 128): g_str = 128 // (2M) virtual streams side by side
([re columns | im columns] per stream), with each virtual stream's kp
history rows PREPENDED — carried state for the first fold, plain input
rows for the rest. A single real stream (the production MMDVM case) is
time-folded into `fold` virtual streams, so the lanes stay full. With the
history embedded, every tile j simply DMAs packed rows
[j*ttt, j*ttt + ttt + kp) — no first-tile special case, one aligned DMA
per tile.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

try:  # pallas is TPU-only at runtime but importable everywhere
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_LANE = 128
_VMEM_BUDGET = 12 * 1024 * 1024
# The branch-FIR FMAs are exact f32 on the VPU; only the M-point DFT rides
# the MXU. HIGHEST (bf16x3 pathway on this hardware) keeps the DFT within
# f32 rounding of the jnp path; the DFT is a minor share of kernel work.
MATMUL_PRECISION = "highest"
_MIN_ELEMS = 1 << 21

# Opt-in (QRL_FUSED_PFB=1): on the current axon backend the mandatory
# XLA lane-pack transpose in front of this kernel costs more than the
# whole depthwise+einsum path it replaces (measured r5: M=64 fused
# 1.23 ms vs 0.83 ms jnp; M=10x16 3.74 vs 2.89 — Mosaic cannot DMA
# sub-128-lane windows, so the (stream, plane) interleave cannot be
# done by the kernel itself). The kernel is bit-exact and CI-covered;
# on hardware with full-speed XLA transposes it wins by ~2x.
import os as _os
ENABLED = _os.environ.get("QRL_FUSED_PFB", "0") == "1"


def available() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


@functools.lru_cache(maxsize=None)
def plan(B: int, Tm: int, M: int, kp: int):
    """Static plan: (g_str, fold, n_bg, ttt, n_serve, rs) or None.

    B streams of Tm x2d rows each, M channels, kp taps per branch.
    Virtual streams V = B*fold; each covers tseg = n_serve*ttt rows.
    """
    if B <= 0 or Tm <= 0 or M < 2 or kp < 8 or kp > 256 or kp % 8:
        return None
    if 2 * M > _LANE or M % 2:
        return None
    if B * Tm * M * 2 < _MIN_ELEMS:
        return None
    g_str = _LANE // (2 * M)
    fold = max(1, -(-g_str // B)) if B < g_str else 1
    v = B * fold
    n_bg = -(-v // g_str)
    for ttt in (2048, 1024, 512, 256):
        n_serve = (Tm // fold) // ttt
        if n_serve < 2:
            continue
        rs = ttt + kp
        vmem = (2 * rs * _LANE            # double-buffered input slab
                + ttt * _LANE             # FIR accumulator
                + 2 * _LANE * ttt         # double-buffered out staging
                + (kp + 1) * _LANE + _LANE * _LANE) * 4
        if vmem > _VMEM_BUDGET:
            continue
        return (g_str, fold, n_bg, ttt, n_serve, rs)
    return None


@functools.lru_cache(maxsize=None)
def _tables(M: int, kp: int, btq_key, g_str: int):
    """Column-tap matrix (kp+1, 128) and permuted block-diag DFT RHS
    (128, 128), tiled over the g_str virtual-stream slots."""
    btq = np.frombuffer(btq_key, np.float32).reshape(M, kp)
    ct = np.zeros((kp + 1, M), np.float32)
    ct[:kp, 0] = btq[M - 1]
    for c in range(1, M):
        ct[1:, c] = btq[c - 1]
    k = np.arange(M)
    w = np.exp(2j * np.pi * np.outer(k, k) / M)  # w[k, p]
    wq = w[:, ::-1]                              # column q -> branch M-1-q
    wc = np.zeros((M, M), np.complex64)
    for c in range(M):
        wc[:, c] = wq[:, (c - 1) % M]
    # RHS[i, o]: i = slot*2M + plane_in*M + c, o = slot*2M + plane_out*M + k
    blk = np.zeros((2 * M, 2 * M), np.float32)
    blk[0:M, 0:M] = wc.real.T          # re -> re
    blk[M:2 * M, 0:M] = -wc.imag.T     # im -> re
    blk[0:M, M:2 * M] = wc.imag.T      # re -> im
    blk[M:2 * M, M:2 * M] = wc.real.T  # im -> im
    taps128 = np.zeros((kp + 1, _LANE), np.float32)
    rhs = np.zeros((_LANE, _LANE), np.float32)
    for s in range(g_str):
        lo = s * 2 * M
        taps128[:, lo:lo + M] = ct
        taps128[:, lo + M:lo + 2 * M] = ct
        rhs[lo:lo + 2 * M, lo:lo + 2 * M] = blk
    # numpy, not jnp: jnp constants created inside one trace must not be
    # cached and reused in another (UnexpectedTracerError)
    return taps128, rhs


def _pack(xs, hist, B, Tm, M, kp, g_str, fold, n_bg, tseg):
    """Assemble (n_bg, kp + tseg, 128): virtual streams in lane slots,
    kp history rows prepended per virtual stream. One fused XLA pass."""
    v_real = B * fold
    v_pad = n_bg * g_str
    planes = []
    for x in xs:
        x2d = x.reshape((B, Tm, M))
        segs = x2d[:, :fold * tseg, :].reshape((B, fold, tseg, M))
        planes.append(segs)
    hist4 = hist.reshape((B, 2, kp, M))
    heads = []
    for p, segs in enumerate(planes):
        # fold 0 history = carried state; fold f>0 = input rows just
        # before the segment
        h0 = hist4[:, p][:, None]                       # (B, 1, kp, M)
        if fold > 1:
            x2d = xs[p].reshape((B, Tm, M))
            hf = jnp.stack(
                [x2d[:, f * tseg - kp: f * tseg, :] for f in range(1, fold)],
                axis=1)                                  # (B, fold-1, kp, M)
            heads.append(jnp.concatenate([h0, hf], axis=1))
        else:
            heads.append(h0)
    # (B, fold, kp+tseg, 2, M) -> virtual-major rows
    full = jnp.stack(
        [jnp.concatenate([heads[p], planes[p]], axis=2) for p in range(2)],
        axis=3)                                          # (B,fold,R,2,M)
    full = full.reshape((v_real, kp + tseg, 2 * M))
    if v_pad != v_real:
        full = jnp.concatenate(
            [full, jnp.zeros((v_pad - v_real, kp + tseg, 2 * M),
                             jnp.float32)], axis=0)
    full = full.reshape((n_bg, g_str, kp + tseg, 2 * M))
    full = jnp.moveaxis(full, 1, 2)                      # (n_bg,R,g_str,2M)
    full = full.reshape((n_bg, kp + tseg, g_str * 2 * M))
    if g_str * 2 * M != _LANE:
        full = jnp.concatenate(
            [full, jnp.zeros((n_bg, kp + tseg, _LANE - g_str * 2 * M),
                             jnp.float32)], axis=-1)
    return full


def _fused_call(packed, taps, rhs, M, kp, g_str, n_bg, ttt, n_serve, rs):
    """packed: (n_bg, kp + n_serve*ttt, 128) f32. Returns
    (n_bg*g_str*2*M, n_serve*ttt) f32, rows (virtual stream, plane,
    channel)."""
    rows_out = g_str * 2 * M

    def kernel(x_ref, t_ref, r_ref, o_ref, slab, obuf, isem, osem):
        g = pl.program_id(0)

        def in_dma(jj, slot):
            return pltpu.make_async_copy(
                x_ref.at[g, pl.ds(jj * ttt, rs), :],
                slab.at[slot], isem.at[slot])

        def out_dma(jj, slot):
            return pltpu.make_async_copy(
                obuf.at[slot, pl.ds(0, rows_out), :],
                o_ref.at[pl.ds(g * rows_out, rows_out),
                         pl.ds(jj * ttt, ttt)],
                osem.at[slot])

        in_dma(0, 0).start()

        def body(j, _):
            slot = lax.rem(j, 2)

            @pl.when(j + 1 < n_serve)
            def _():
                in_dma(j + 1, lax.rem(j + 1, 2)).start()

            in_dma(j, slot).wait()

            # branch FIR: kp+1 sublane-shifted broadcast FMAs
            acc = slab[slot, pl.ds(kp, ttt), :] * t_ref[0:1, :]
            for l in range(1, kp + 1):
                acc = acc + slab[slot, pl.ds(kp - l, ttt), :] \
                    * t_ref[l:l + 1, :]

            # DFT across branches; contracting acc's lane axis makes the
            # MXU emit the channel-major output transpose for free
            @pl.when(j >= 2)
            def _():
                out_dma(j - 2, slot).wait()
            obuf[slot] = lax.dot_general(
                r_ref[:, :], acc, (((0,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision(MATMUL_PRECISION))
            out_dma(j, slot).start()
            return 0

        lax.fori_loop(0, n_serve, body, 0)

        @pl.when(n_serve >= 2)
        def _():
            out_dma(n_serve - 2, lax.rem(n_serve - 2, 2)).wait()
        out_dma(n_serve - 1, lax.rem(n_serve - 1, 2)).wait()

    return pl.pallas_call(
        kernel,
        grid=(n_bg,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)]
        + [pl.BlockSpec((kp + 1, _LANE), lambda g: (0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((_LANE, _LANE), lambda g: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        out_shape=jax.ShapeDtypeStruct(
            (n_bg * rows_out, n_serve * ttt), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, rs, _LANE), jnp.float32),
            pltpu.VMEM((2, _LANE, ttt), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(packed, taps, rhs)


def channelize(xs, hist, btq: np.ndarray, M: int, kp: int):
    """Fused PFB channelizer over f32 planes.

    xs: (x_re, x_im), each (..., T) with T = Tm*M; hist: (..., 2, kp*M)
    raw input history (oldest first; element 0 is never read); btq:
    concrete (M, kp) commutator-ordered branch taps.

    Returns ((y_re, y_im) each (..., M, n_main), n_main) covering output
    rows [0, n_main) — the caller computes rows [n_main, Tm) from a small
    input slice — or None if unservable.
    """
    if not available():
        return None
    if isinstance(btq, jax.core.Tracer):
        return None
    lead = xs[0].shape[:-1]
    T = xs[0].shape[-1]
    if T % M != 0:
        return None
    Tm = T // M
    B = int(np.prod(lead, dtype=np.int64)) if lead else 1
    p = plan(B, Tm, M, kp)
    if p is None:
        return None
    g_str, fold, n_bg, ttt, n_serve, rs = p
    btq_np = np.ascontiguousarray(np.asarray(btq, np.float32))
    taps, rhs = _tables(M, kp, btq_np.tobytes(), g_str)
    tseg = n_serve * ttt
    xs2 = tuple(x.reshape((B, T)) for x in xs)
    packed = _pack(xs2, hist.reshape((B, 2, kp * M)), B, Tm, M, kp,
                   g_str, fold, n_bg, tseg)
    out = _fused_call(packed, taps, rhs, M, kp,
                      g_str, n_bg, ttt, n_serve, rs)
    n_main = fold * tseg
    # rows: (bg, slot, plane, channel); virtual stream v = b*fold + f
    y = out.reshape((n_bg * g_str, 2, M, tseg))[:B * fold]
    if fold > 1:
        y = y.reshape((B, fold, 2, M, tseg))
        y = jnp.moveaxis(y, 1, -2)              # (B, 2, M, fold, tseg)
        y = y.reshape((B, 2, M, n_main))
    else:
        y = y.reshape((B, 2, M, n_main))
    yr = y[:, 0].reshape(lead + (M, n_main))
    yi = y[:, 1].reshape(lead + (M, n_main))
    return (yr, yi), n_main
