"""Pallas TPU kernels validated on CPU via interpreter mode.

On hardware these kernels run compiled by Mosaic; here pallas_call is
patched to interpret=True so the kernel logic (banded-matmul tiling,
manual double-buffered DMA schedules, tail streaming, the Viterbi
ACS/traceback loop) is exercised in CI without a TPU. Hardware numerics
were additionally verified on the real chip (rel err ~3e-7 vs the jnp
path for the FIR; bit-exact for the Viterbi).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental import pallas as pl

import qradiolink_tpu.ops.pallas_fir as pf
import qradiolink_tpu.ops.pallas_pfb as pp
import qradiolink_tpu.fec.viterbi_pallas as vp
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import _conv1d_real

pytestmark = pytest.mark.fast


@pytest.fixture
def pallas_interp(monkeypatch):
    monkeypatch.setattr(pl, "pallas_call",
                        functools.partial(pl.pallas_call, interpret=True))
    monkeypatch.setattr(pf, "available", lambda: True)
    monkeypatch.setattr(vp, "available", lambda: True)
    monkeypatch.setattr(pp, "available", lambda: True)
    monkeypatch.setattr(pp, "ENABLED", True)
    monkeypatch.setattr(pf, "_MIN_ELEMS", 1)
    monkeypatch.setattr(pp, "_MIN_ELEMS", 1)
    # plans are memoized per (shape, params); clear so the patched
    # _MIN_ELEMS takes effect
    pf.plan.cache_clear()
    pf.stream_plan.cache_clear()
    pf.depthwise_plan.cache_clear()
    pp.plan.cache_clear()
    yield
    pf.plan.cache_clear()
    pf.stream_plan.cache_clear()
    pf.depthwise_plan.cache_clear()
    pp.plan.cache_clear()


HEAD_TAPS = firdes.low_pass(1.0, 1_000_000, 10_000, 10_000,
                            firdes.WIN_BLACKMAN_HARRIS)


def test_banded_fir_f32_matches_jnp(pallas_interp, rng):
    k = len(HEAD_TAPS)
    x = jnp.asarray(rng.standard_normal((8, 40_000 + k - 1))
                    .astype(np.float32))
    y = pf.banded_fir(x, HEAD_TAPS, 50, None)
    assert y is not None, "pallas path did not trigger"
    ref = _conv1d_real(x, jnp.asarray(HEAD_TAPS)[::-1], 50)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_banded_fir_complex_two_streams(pallas_interp, rng):
    k = len(HEAD_TAPS)
    xn = (rng.standard_normal((8, 40_000 + k - 1))
          + 1j * rng.standard_normal((8, 40_000 + k - 1))) \
        .astype(np.complex64)
    x = jnp.asarray(xn)
    y = pf.banded_fir(x, HEAD_TAPS, 50, None)
    assert y is not None
    tf = jnp.asarray(HEAD_TAPS)[::-1]
    ref = jax.lax.complex(_conv1d_real(x.real, tf, 50),
                          _conv1d_real(x.imag, tf, 50))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_banded_fir_stream_tail_semantics(pallas_interp, rng):
    """The concat-free tail-streaming kernel must equal conv over the
    explicit [tail | x] concatenation, across two chained blocks."""
    k = len(HEAD_TAPS)
    D = 50
    C, T = 8, 40_000
    tf = jnp.asarray(HEAD_TAPS)[::-1]
    xs = [rng.standard_normal((C, T)).astype(np.float32) for _ in range(2)]
    tail_re = np.zeros((C, k - 1), np.float32)
    tail_im = np.zeros((C, k - 1), np.float32)
    for blk in xs:
        res = pf.banded_fir_stream(
            (jnp.asarray(tail_re), jnp.asarray(tail_im)),
            (jnp.asarray(blk), jnp.asarray(-blk)), HEAD_TAPS, D, T // D)
        assert res is not None, "stream kernel did not trigger"
        (yr, yi), n_main = res
        xc = np.concatenate([tail_re, blk], axis=-1)
        ref = np.asarray(_conv1d_real(jnp.asarray(xc), tf, D))
        np.testing.assert_allclose(np.asarray(yr), ref[:, :n_main],
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(yi), -ref[:, :n_main],
                                   rtol=1e-5, atol=1e-5)
        tail_re = xc[:, -(k - 1):]
        tail_im = -tail_re


def test_viterbi_pallas_bit_exact_vs_jnp(pallas_interp, rng):
    from qradiolink_tpu.fec import conv_ff
    from qradiolink_tpu.fec.conv import CCSDS_K7

    soft = jnp.asarray(rng.integers(0, 256, (4, 512, 2)).astype(np.float32))
    # pallas path (forced available; interpret mode)
    bits_p = conv_ff.viterbi_decode_tiled(CCSDS_K7, soft)
    # jnp path
    orig = vp.available
    vp.available = lambda: False
    try:
        bits_j = conv_ff.viterbi_decode_tiled(CCSDS_K7, soft)
    finally:
        vp.available = orig
    np.testing.assert_array_equal(np.asarray(bits_p), np.asarray(bits_j))


def test_viterbi_pallas_decodes_real_codewords(pallas_interp, rng):
    from qradiolink_tpu.fec import conv_ff
    from qradiolink_tpu.fec.conv import CCSDS_K7, conv_encode

    bits = rng.integers(0, 2, 600).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    soft = np.where(coded > 0, 255.0, 0.0).astype(np.float32)
    soft = soft.reshape(1, -1, 2)
    # pad to a chunk multiple like TiledViterbi does
    pad = (-soft.shape[1]) % 128
    soft = np.pad(soft, ((0, 0), (0, pad), (0, 0)),
                  constant_values=128.0)
    dec = np.asarray(conv_ff.viterbi_decode_tiled(
        CCSDS_K7, jnp.asarray(soft)))[0]
    # interior decisions must match (edges are warmup)
    assert np.array_equal(dec[32:600 - 32], bits[32:600 - 32])


@pytest.mark.parametrize("M,B,Tm", [(10, 4, 1100), (64, 1, 600),
                                    (10, 1, 3600)])
def test_fused_pfb_channelizer(pallas_interp, rng, M, B, Tm):
    """The single-launch fused channelizer kernel (branch FIR + DFT +
    commutator fold, incl. the time-folded single-stream path) must match
    the jnp PfbChannelizer path across a two-block stream."""
    from qradiolink_tpu.ops.channelizer import PfbChannelizer
    from qradiolink_tpu.core import IqPair

    ch = PfbChannelizer(M, lead_shape=(B,))
    T = Tm * M
    xs = [(rng.standard_normal((B, T)) + 1j * rng.standard_normal((B, T)))
          .astype(np.complex64) for _ in range(2)]
    st_ref = ch.init_state()
    st_kern = ch.init_state()
    for x in xs:
        # complex path = jnp reference (channelize() only serves IqPair)
        st_ref, y_ref = ch(st_ref, jnp.asarray(x))
        assert pp.plan(B, Tm, M, ch.kp) is not None, "plan rejected"
        st_kern, y_k = ch(st_kern, IqPair(jnp.asarray(x.real),
                                          jnp.asarray(x.imag)))
        got = np.asarray(y_k.re) + 1j * np.asarray(y_k.im)
        ref = np.asarray(y_ref)
        err = np.abs(got - ref).max() / np.abs(ref).max()
        assert err < 1e-5, err
        np.testing.assert_allclose(np.asarray(st_kern), np.asarray(st_ref),
                                   rtol=1e-6, atol=1e-7)


def test_depthwise_fir_per_row_taps(pallas_interp, rng):
    """Per-row-taps depthwise kernel (PFB branch filters) vs per-row
    numpy convolution."""
    C, Tb, kp = 8, 6000, 32
    taps = rng.standard_normal((C, kp)).astype(np.float32)
    ucr = rng.standard_normal((C, Tb + kp - 1)).astype(np.float32)
    uci = rng.standard_normal((C, Tb + kp - 1)).astype(np.float32)
    res = pf.depthwise_fir((jnp.asarray(ucr), jnp.asarray(uci)),
                           taps, Tb)
    assert res is not None, "depthwise kernel did not trigger"
    (vr, vi), n_main = res
    assert n_main >= 2048
    for plane, got in ((ucr, vr), (uci, vi)):
        for c in range(C):
            ref = np.convolve(plane[c], taps[c], "valid")
            np.testing.assert_allclose(np.asarray(got)[c], ref[:n_main],
                                       rtol=1e-4, atol=1e-4)


def test_depthwise_plan_rejects_unfit_shapes(pallas_interp):
    assert pf.depthwise_plan(7, 100_000, 32, 2) is None   # C % CT != 0
    assert pf.depthwise_plan(8, 3000, 32, 2) is None      # too few tiles


def test_stream_kernel_extra_shift_polyphase(pallas_interp, rng):
    """The per-phase offset fold (extra_shift) must reproduce the
    generic polyphase path — the DMR/M17 3/125 resampler head."""
    from qradiolink_tpu.core import IqPair
    from qradiolink_tpu.ops.resample import RationalResampler

    # 3/8 with 32 rows: a shape the CT>=32 row-tiling gate accepts
    # (big-D resamplers like 3/125 are gated to the fused-XLA path)
    x = ((rng.standard_normal((32, 16_000))
          + 1j * rng.standard_normal((32, 16_000)))).astype(np.complex64)
    rs = RationalResampler(3, 8, lead_shape=(32,))
    s0 = rs.init_state()
    st_c, y_c = rs(s0, jnp.asarray(x))             # complex/generic path
    st_p, y_p = rs(s0, IqPair(jnp.asarray(x.real), jnp.asarray(x.imag)))
    plan0 = pf.stream_plan(32, 16_000, rs.kp, rs.M, 2,
                           max(rs.offsets[1:], default=0))
    assert plan0 is not None and plan0[3] >= 32, \
        "stream kernel did not engage for this shape"
    np.testing.assert_allclose(np.asarray(y_p.to_complex()),
                               np.asarray(y_c), rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(st_c),
                    jax.tree_util.tree_leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_depthwise_plan_caps_output_vmem(pallas_interp):
    """Multi-megasample inputs must not plan a VMEM-resident output
    block beyond budget (r5 regression: the M=64 synthesizer at 1.2M
    rows crashed the compiler before the cap; the remainder is computed
    by the caller)."""
    p = pf.depthwise_plan(128, 1_200_000, 24, 2)
    assert p is not None
    TT, LS, CT, n_c, n_t = p
    fixed = (2 * 2 * CT * LS + CT * 24) * 4
    out_bytes = 2 * CT * n_t * TT * 4
    assert fixed + out_bytes <= pf._VMEM_BUDGET
    # and small shapes still serve everything
    p2 = pf.depthwise_plan(64, 25_024, 24, 2)
    assert p2 is not None and p2[4] * p2[0] <= 25_000


def test_viterbi_pallas_small_rows_streamed(pallas_interp, rng):
    """The mixed-config tail shape (32 ch x 200 pairs/step, streamed):
    small row counts (R=32 < the old 256-row gate) must be served by
    the kernel and stay bit-identical to the jnp path across streamed
    blocks (verified on-chip 2026-08-21; this locks it in CI)."""
    from qradiolink_tpu.fec import conv_ff
    from qradiolink_tpu.fec.conv import CCSDS_K7
    from qradiolink_tpu.fec.conv_ff import TiledViterbi

    tv = TiledViterbi(CCSDS_K7, chunk=128, lead_shape=(32,))
    blocks = [jnp.asarray(rng.integers(0, 256, (32, 200, 2))
                          .astype(np.float32)) for _ in range(3)]

    def stream(use_kernel):
        orig = vp.available
        if not use_kernel:
            vp.available = lambda: False
        try:
            st = tv.init_state()
            outs = []
            for s in blocks:
                st, bits = tv(st, s)
                outs.append(np.asarray(bits))
        finally:
            vp.available = orig
        return np.concatenate(outs, axis=-1)

    np.testing.assert_array_equal(stream(True), stream(False))
