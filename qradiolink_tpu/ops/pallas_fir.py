"""Banded-matmul streaming FIR — the Pallas TPU front-end kernel.

The hot front half of every RX chain is a decimating FIR at the device
sample rate (reference: gr::filter::rational_resampler / fft_filter used
at 1 Msps in every gr_demod_* constructor, e.g.
/root/reference/src/gr/gr_demod_base.cpp:1303-1359 and
gr_demod_4fsk.cpp:46-74).  The jnp formulation (ops/fir.py) reads the
input once per frame-chunk term (~9x HBM traffic for the 419-tap /50
head, and 2x that for complex IQ); this kernel reads the input exactly
once and turns the whole strided FIR into MXU matmuls:

  view a G-output tile as  Y[c, g] = sum_l X[c, j*G*D + l] * W[l, g]
  with the banded matrix    W[l, g] = h[l - g*D]  (zero outside the band)

so one (C, L) x (L, G) matmul per tile computes G consecutive decimated
outputs for every channel.  W (<= ~3.5 MB) stays resident in VMEM; input
slabs are streamed HBM->VMEM with a manually double-buffered async copy
(slabs of consecutive tiles overlap by K-1 samples, which grid BlockSpecs
cannot express).  Channels ride the sublane axis, time rides the lane
axis — the layout the chains already use, so no transposes.

Complex IQ is handled as two parallel f32 streams (real/imag planes
share W and the slab schedule inside one kernel launch).

Numerics: f32 accumulate at lax.Precision.HIGHEST — bit-comparable to
the jnp path (max rel err ~3e-7 measured on the 419-tap head).
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

_VMEM_BUDGET = 12 * 1024 * 1024
# matmul precision for the banded kernels. HIGHEST is bit-comparable
# to the f32 jnp path (~3e-7 rel); "default" (single bf16 pass) is
# ~2.7e-3 rel — Mosaic supports only these two. Measured: the kernels
# are DMA/overhead-bound, so HIGHEST costs almost nothing here.
MATMUL_PRECISION = "highest"
_MIN_ELEMS = 1 << 22  # below this a fused XLA loop beats the launch cost
_MIN_TAP_OPS = 1 << 27  # ...unless the tap count makes the XLA loop pay
#                         K sliding-window HBM reads (e.g. 251-tap RRC)
_LANE = 128


def available() -> bool:
    return _HAVE_PALLAS and jax.default_backend() == "tpu"


def _rec(op: str, served: bool, detail: str = ""):
    """Trace-time path-selection record (utils.profiling.pallas_paths):
    makes jnp fallbacks observable instead of silent."""
    from qradiolink_tpu.utils.profiling import pallas_paths
    pallas_paths.record(op, served, detail)


@functools.lru_cache(maxsize=None)
def plan(C: int, T: int, K: int, D: int, n_streams: int):
    """Static tiling plan or None if the shape isn't servable.

    C: row count per stream (channels), T: input length, K: taps,
    D: decimation, n_streams: parallel f32 planes (1 real / 2 complex).
    Returns (G, L, CT, n_c, n_t, need).
    """
    if C <= 0 or T <= 0 or K <= 0 or D <= 0:
        return None
    if (C * T * n_streams < _MIN_ELEMS
            and C * T * K * n_streams < _MIN_TAP_OPS):
        return None
    n_out = (T - K) // D + 1
    if n_out < 2 * _LANE:
        return None
    # G fixed at 128: the output lane dim must be a full tile, and
    # j*G*D DMA offsets are then 128-aligned for every stride D.
    G = _LANE
    L = -(-((G - 1) * D + K) // _LANE) * _LANE
    for CT in (128, 64, 32, 16, 8):
        if C % CT != 0:
            continue
        # slab double-buffer per stream + resident W + out blocks
        vmem = (2 * n_streams * CT * L + L * G + n_streams * CT * G) * 4
        if vmem > _VMEM_BUDGET:
            continue
        n_c = C // CT
        n_t = -(-n_out // G)
        need = (n_t - 1) * G * D + L
        return (G, L, CT, n_c, n_t, need)
    return None


def build_w(taps: np.ndarray, D: int, G: int, L: int) -> np.ndarray:
    """W[l, g] = taps[l - g*D] (the banded decimation matrix)."""
    K = taps.shape[0]
    W = np.zeros((L, G), np.float32)
    for g in range(G):
        W[g * D: g * D + K, g] = taps
    return W


def _banded_call(xs, w, G, L, CT, n_c, n_t, D):
    """xs: tuple of (C, Tp) f32 planes (Tp >= need). Returns matching
    tuple of (C, n_t*G) f32 outputs (caller slices to n_out)."""
    ns = len(xs)
    C = xs[0].shape[0]

    def kernel(*refs):
        x_refs = refs[:ns]
        w_ref = refs[ns]
        o_refs = refs[ns + 1: ns + 1 + ns]
        slabs = refs[ns + 1 + ns: ns + 1 + 2 * ns]
        sems = refs[-1]
        ci = pl.program_id(0)
        j = pl.program_id(1)
        nt = pl.num_programs(1)

        def dma(s, jj, sl):
            return pltpu.make_async_copy(
                x_refs[s].at[pl.ds(ci * CT, CT), pl.ds(jj * (G * D), L)],
                slabs[s].at[sl],
                sems.at[s, sl],
            )

        @pl.when(j == 0)
        def _():
            for s in range(ns):
                dma(s, 0, 0).start()

        @pl.when(j + 1 < nt)
        def _():
            nxt = lax.rem(j + 1, 2)
            for s in range(ns):
                dma(s, j + 1, nxt).start()

        slot = lax.rem(j, 2)
        for s in range(ns):
            dma(s, j, slot).wait()
            o_refs[s][:, :] = lax.dot_general(
                slabs[s][slot], w_ref[:], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=lax.Precision(MATMUL_PRECISION))

    out = pl.pallas_call(
        kernel,
        grid=(n_c, n_t),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ns
        + [pl.BlockSpec((L, G), lambda ci, j: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CT, G), lambda ci, j: (ci, j),
                                memory_space=pltpu.VMEM)] * ns,
        out_shape=[jax.ShapeDtypeStruct((C, n_t * G), jnp.float32)] * ns,
        scratch_shapes=[pltpu.VMEM((2, CT, L), jnp.float32)] * ns
        + [pltpu.SemaphoreType.DMA((ns, 2))],
    )(*xs, w)
    return out if isinstance(out, (list, tuple)) else (out,)


@functools.lru_cache(maxsize=None)
def stream_plan(C: int, T: int, K: int, D: int, n_streams: int = 2,
                extra_shift: int = 0):
    """Tiling plan for the tail-streaming (concat-free) kernel.

    Virtual stream = [P-padded tail | x]; slab j covers virtual
    [j*G*D, j*G*D+L2).  All DMA offsets/lengths stay 128-aligned because
    P, G*D and L2 are multiples of 128.  Returns
    (G, P, L2, CT, n_c, n_serve) or None.
    """
    if C <= 0 or T <= 0 or K <= 1 or D <= 0:
        return None
    if C * T * n_streams < _MIN_ELEMS:
        return None
    G = _LANE
    P = -(-(K - 1) // _LANE) * _LANE
    if G * D < P:      # slabs past j=0 must start inside x
        return None
    L2 = -(-((G - 1) * D + K + (P - K + 1) + extra_shift) // _LANE) * _LANE
    n_out = T // D
    n_serve = n_out // G
    # keep every x-DMA in bounds: (n_serve-1)*G*D - P + L2 <= T
    while n_serve > 0 and (n_serve - 1) * G * D - P + L2 > T:
        n_serve -= 1
    if n_serve < 2:
        return None
    for CT in (128, 64, 32, 16, 8):
        if C % CT != 0:
            continue
        # double-buffered slabs + resident W + full output block (the
        # kernel iterates time tiles in a fori loop, so the whole
        # (CT, n_serve*G) output lives in VMEM per grid step)
        vmem = (2 * n_streams * CT * L2 + L2 * G
                + 2 * n_streams * CT * n_serve * G) * 4
        if vmem > _VMEM_BUDGET:
            continue
        return (G, P, L2, CT, C // CT, n_serve)
    return None


def _build_w_shifted(taps_flipped: np.ndarray, D: int, G: int, L2: int,
                     s0: int) -> np.ndarray:
    """W[r, g] = tf[r - g*D - s0] (banded matrix with leading shift)."""
    K = taps_flipped.shape[0]
    W = np.zeros((L2, G), np.float32)
    for g in range(G):
        W[g * D + s0: g * D + s0 + K, g] = taps_flipped
    return W


def _stream_call(tails, xs, w, G, P, L2, CT, n_c, n_serve, D):
    """tails: tuple of (C, P) f32; xs: tuple of (C, T) f32.
    Returns tuple of (C, n_serve*G) f32."""
    ns = len(xs)
    C = xs[0].shape[0]

    def kernel(*refs):
        t_refs = refs[:ns]
        x_refs = refs[ns: 2 * ns]
        w_ref = refs[2 * ns]
        o_refs = refs[2 * ns + 1: 3 * ns + 1]
        slabs = refs[3 * ns + 1: 4 * ns + 1]
        sems = refs[-2]
        tsems = refs[-1]
        ci = pl.program_id(0)
        rows = pl.ds(ci * CT, CT)

        def dma_x(s, jj, sl):
            # jj >= 1: slab entirely inside x at offset jj*G*D - P
            off = pl.multiple_of(jj * (G * D) - P, _LANE)
            return pltpu.make_async_copy(
                x_refs[s].at[rows, pl.ds(off, L2)],
                slabs[s].at[sl], sems.at[s, sl])

        def tail_dma(s):
            return pltpu.make_async_copy(
                t_refs[s].at[rows, :], slabs[s].at[0, :, 0:P], tsems.at[s])

        def head_dma(s):
            return pltpu.make_async_copy(
                x_refs[s].at[rows, pl.ds(0, L2 - P)],
                slabs[s].at[0, :, P:L2], sems.at[s, 0])

        # warm-up: tile 0 is assembled from tail + head of x
        for s in range(ns):
            tail_dma(s).start()
            head_dma(s).start()

        # time tiles iterate INSIDE the kernel: one Mosaic grid step per
        # channel tile, so the multi-10us per-grid-step overhead of the
        # axon backend is paid n_c times, not n_c*n_serve times
        def body(j, _):
            slot = lax.rem(j, 2)

            @pl.when(j + 1 < n_serve)
            def _():
                for s in range(ns):
                    dma_x(s, j + 1, lax.rem(j + 1, 2)).start()

            col = pl.multiple_of(j * G, _LANE)
            for s in range(ns):
                @pl.when(j == 0)
                def _(s=s):
                    tail_dma(s).wait()
                    head_dma(s).wait()

                @pl.when(j > 0)
                def _(s=s):
                    dma_x(s, j, slot).wait()

                o_refs[s][:, pl.ds(col, G)] = lax.dot_general(
                    slabs[s][slot], w_ref[:], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision(MATMUL_PRECISION))
            return 0

        lax.fori_loop(0, n_serve, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_c,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * (2 * ns)
        + [pl.BlockSpec((L2, G), lambda ci: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CT, n_serve * G), lambda ci: (ci, 0),
                                memory_space=pltpu.VMEM)] * ns,
        out_shape=[jax.ShapeDtypeStruct((C, n_serve * G), jnp.float32)] * ns,
        scratch_shapes=[pltpu.VMEM((2, CT, L2), jnp.float32)] * ns
        + [pltpu.SemaphoreType.DMA((ns, 2)), pltpu.SemaphoreType.DMA((ns,))],
    )(*tails, *xs, w)
    return out if isinstance(out, (list, tuple)) else (out,)


def banded_fir_stream(tails, xs, taps, stride: int, out_len: int,
                      extra_shift: int = 0):
    """Concat-free streaming strided FIR over parallel f32 planes.

    tails: tuple of (..., K-1) f32 carried histories; xs: matching tuple
    of (..., T) f32 blocks; taps concrete real 1-D; out_len = number of
    outputs wanted (= T // stride for block streaming).

    Computes y[m] = sum_k taps[k] * xc[m*stride + extra_shift + K-1 - k]
    over the virtual stream xc = [tail | x] WITHOUT materialising the
    concat: the kernel assembles each VMEM slab from the tail ref (j=0)
    and the x ref directly. extra_shift folds a small input offset into
    the banded matrix — the polyphase-resampler per-phase offset q_r, so
    L-phase rational resamplers run one stream-kernel launch per phase
    with no shifted-input copies.  Returns (ys_main, n_main) where
    ys_main covers outputs [0, n_main); the caller computes the
    remaining out_len - n_main outputs from a small x slice. None if
    unservable.
    """
    if not available():
        return None
    if isinstance(taps, jax.core.Tracer):
        return None
    taps_np = np.asarray(taps)
    if taps_np.ndim != 1 or np.iscomplexobj(taps_np):
        return None
    K = int(taps_np.shape[0])
    D = int(stride)
    lead = xs[0].shape[:-1]
    T = xs[0].shape[-1]
    C = int(np.prod(lead, dtype=np.int64)) if lead else 1
    if not 0 <= int(extra_shift) < max(D, 2):
        _rec("banded_fir_stream", False, f"shift C{C} T{T} K{K} D{D}")
        return None
    p = stream_plan(C, T, K, D, len(xs), int(extra_shift))
    if p is None:
        _rec("banded_fir_stream", False, f"plan C{C} T{T} K{K} D{D}")
        return None
    _rec("banded_fir_stream", True, f"C{C} T{T} K{K} D{D}")
    G, P, L2, CT, n_c, n_serve = p
    n_main = n_serve * G
    if n_main > out_len:
        n_serve = out_len // G
        if n_serve < 2:
            return None
        n_main = n_serve * G
    # W rows shift by the tail padding PLUS the caller's phase offset;
    # the tail buffer itself is always padded to exactly P
    s0 = P - (K - 1) + int(extra_shift)
    w = jnp.asarray(_build_w_shifted(taps_np[::-1].astype(np.float32),
                                     D, G, L2, s0))
    tails2 = tuple(jnp.pad(t.reshape((C, K - 1)), ((0, 0), (P - (K - 1), 0)))
                   for t in tails)
    xs2 = tuple(x.reshape((C, T)) for x in xs)
    ys = _stream_call(tails2, xs2, w, G, P, L2, CT, n_c, n_serve, D)
    return tuple(y.reshape(lead + (n_main,)) for y in ys), n_main


@functools.lru_cache(maxsize=None)
def depthwise_plan(C: int, Tc: int, kp: int, n_streams: int):
    """Plan for the per-row-taps (depthwise) stride-1 FIR kernel.

    Used by the PFB channelizer's branch filters: C rows, each with its
    OWN kp-tap filter (unshared taps rule out the banded matmul). One
    HBM pass: slabs of TT+pad lanes stream through VMEM and the kp
    shifted FMAs read from VMEM. Returns (TT, LS, CT, n_c, n_t) or
    None; the caller must provide input length >= n_t*TT + halo_pad
    (halo_pad = LS - TT) and computes the remaining outputs itself.
    """
    if C <= 0 or Tc <= 0 or kp <= 1 or kp > 512:
        return None
    if C * Tc * n_streams < _MIN_ELEMS // 2:
        return None
    TT = 2048
    halo = -(-(kp - 1) // _LANE) * _LANE
    LS = TT + halo
    t_valid = Tc - (kp - 1)
    n_t = t_valid // TT
    # every slab must fit: (n_t-1)*TT + LS <= Tc
    while n_t > 0 and (n_t - 1) * TT + LS > Tc:
        n_t -= 1
    if n_t < 2:
        return None
    for CT in (128, 64, 32, 16, 8):
        if C % CT != 0:
            continue
        fixed = (2 * n_streams * CT * LS + CT * kp) * 4
        if fixed > _VMEM_BUDGET:
            continue
        # the whole (CT, n_t*TT) output block lives in VMEM per grid
        # step — cap n_t so it fits (the caller computes the remainder)
        per_tile = n_streams * CT * TT * 4
        n_fit = max(0, (_VMEM_BUDGET - fixed) // per_tile)
        n_use = min(n_t, n_fit)
        if n_use < 2:
            continue
        return (TT, LS, CT, C // CT, n_use)
    return None


def _depthwise_call(xs, taps, TT, LS, CT, n_c, n_t, kp):
    """xs: tuple of (C, Tc) f32; taps (C, kp) f32.
    Returns tuple of (C, n_t*TT) f32 outputs."""
    ns = len(xs)
    C = xs[0].shape[0]

    def kernel(*refs):
        x_refs = refs[:ns]
        t_ref = refs[ns]
        o_refs = refs[ns + 1: 2 * ns + 1]
        slabs = refs[2 * ns + 1: 3 * ns + 1]
        sems = refs[-1]
        ci = pl.program_id(0)
        rows = pl.ds(ci * CT, CT)

        def dma(s, jj, sl):
            off = pl.multiple_of(jj * TT, _LANE)
            return pltpu.make_async_copy(
                x_refs[s].at[rows, pl.ds(off, LS)],
                slabs[s].at[sl], sems.at[s, sl])

        for s in range(ns):
            dma(s, 0, 0).start()

        def body(j, _):
            slot = lax.rem(j, 2)

            @pl.when(j + 1 < n_t)
            def _():
                for s in range(ns):
                    dma(s, j + 1, lax.rem(j + 1, 2)).start()

            col = pl.multiple_of(j * TT, _LANE)
            for s in range(ns):
                dma(s, j, slot).wait()
                slab = slabs[s][slot]
                acc = slab[:, 0:TT] * t_ref[:, 0:1]
                for k in range(1, kp):
                    acc = acc + slab[:, k:k + TT] * t_ref[:, k:k + 1]
                o_refs[s][:, pl.ds(col, TT)] = acc
            return 0

        lax.fori_loop(0, n_t, body, 0)

    out = pl.pallas_call(
        kernel,
        grid=(n_c,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * ns
        + [pl.BlockSpec((CT, kp), lambda ci: (ci, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((CT, n_t * TT), lambda ci: (ci, 0),
                                memory_space=pltpu.VMEM)] * ns,
        out_shape=[jax.ShapeDtypeStruct((C, n_t * TT), jnp.float32)] * ns,
        scratch_shapes=[pltpu.VMEM((2, CT, LS), jnp.float32)] * ns
        + [pltpu.SemaphoreType.DMA((ns, 2))],
    )(*xs, taps)
    return out if isinstance(out, (list, tuple)) else (out,)


def depthwise_fir(xs, taps, out_len: int):
    """Per-row-taps VALID FIR, stride 1, flipped-taps convention of
    conv1d_valid: y[c, m] = sum_k taps[c, k] * x[c, m + kp-1 - k].

    xs: tuple of (..., C, Tc) f32 planes sharing the taps; taps:
    concrete (C, kp). Returns (ys, n_main) with ys covering outputs
    [0, n_main) — the caller computes the remainder — or None.
    """
    if not available():
        return None
    if isinstance(taps, jax.core.Tracer):
        return None
    taps_np = np.asarray(taps)
    if taps_np.ndim != 2 or np.iscomplexobj(taps_np):
        return None
    lead = xs[0].shape[:-2]
    C = xs[0].shape[-2]
    Tc = xs[0].shape[-1]
    kp = int(taps_np.shape[-1])
    if taps_np.shape[0] != C:
        return None
    cf = int(np.prod(lead, dtype=np.int64)) * C if lead else C
    p = depthwise_plan(cf, Tc, kp, len(xs))
    if p is None:
        _rec("depthwise_fir", False, f"plan C{cf} T{Tc} kp{kp}")
        return None
    _rec("depthwise_fir", True, f"C{cf} T{Tc} kp{kp}")
    TT, LS, CT, n_c, n_t = p
    n_main = min(n_t * TT, out_len)
    if n_main < TT:
        return None
    tf = np.ascontiguousarray(taps_np[:, ::-1].astype(np.float32))
    if lead:
        tf = np.tile(tf, (int(np.prod(lead, dtype=np.int64)), 1))
    xs2 = tuple(x.reshape((cf, Tc)) for x in xs)
    ys = _depthwise_call(xs2, jnp.asarray(tf), TT, LS, CT, n_c, n_t, kp)
    return (tuple(y[:, :n_main].reshape(lead + (C, n_main)) for y in ys),
            n_main)


def extra_pad(C: int, T: int, K: int, D: int, complex_x: bool) -> int:
    """Zero-padding (in samples) a caller should append so the pallas
    path runs copy-free. 0 when the path won't trigger."""
    if not available():
        return 0
    p = plan(C, T, K, D, 2 if complex_x else 1)
    if p is None:
        return 0
    need = p[5]
    return max(0, need - T)


def banded_fir(x: jax.Array, taps, stride: int, out_len=None):
    """Strided VALID FIR via the banded-matmul kernel, or None if the
    input isn't servable.  x: (..., T) f32/complex64; taps: concrete
    real 1-D; stride >= 1.  y[m] = sum_k taps[k] * x[m*stride + K-1-k]
    (same convention as ops.fir.conv1d_valid).
    """
    if not available():
        return None
    if isinstance(taps, jax.core.Tracer):
        return None  # W must be concrete (built host-side)
    taps_np = np.asarray(taps)
    if taps_np.ndim != 1 or np.iscomplexobj(taps_np):
        return None
    if x.dtype not in (jnp.float32, jnp.complex64):
        return None
    K = int(taps_np.shape[0])
    D = int(stride)
    lead = x.shape[:-1]
    T = x.shape[-1]
    C = int(np.prod(lead, dtype=np.int64)) if lead else 1
    cx = jnp.iscomplexobj(x)
    ns = 2 if cx else 1
    n_out_full = (T - K) // D + 1
    n_out = int(out_len) if out_len is not None else n_out_full
    if n_out > n_out_full:
        raise ValueError(f"out_len {n_out} exceeds available {n_out_full}")
    p = plan(C, T, K, D, ns)
    if p is None:
        _rec("banded_fir", False, f"plan C{C} T{T} K{K} D{D}")
        return None
    G, L, CT, n_c, n_t_cap, need = p
    n_t = -(-n_out // G)
    if n_t < 2:
        _rec("banded_fir", False, f"tiles C{C} T{T} K{K} D{D}")
        return None
    _rec("banded_fir", True, f"C{C} T{T} K{K} D{D}")
    need_here = (n_t - 1) * G * D + L
    x2 = x.reshape((C, T))
    if T < need_here:
        x2 = jnp.pad(x2, ((0, 0), (0, need_here - T)))
    # VALID conv flips taps: y[m] = sum_l x[m*D + l] * taps[K-1-l]
    w = jnp.asarray(build_w(taps_np[::-1].astype(np.float32), D, G, L))
    if cx:
        ys = _banded_call((x2.real, x2.imag), w, G, L, CT, n_c, n_t, D)
        y = lax.complex(ys[0][:, :n_out], ys[1][:, :n_out])
    else:
        ys = _banded_call((x2,), w, G, L, CT, n_c, n_t, D)
        y = ys[0][:, :n_out]
    return y.reshape(lead + (n_out,))
