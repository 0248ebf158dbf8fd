import numpy as np
import jax.numpy as jnp
import scipy.signal as sps
import pytest

from qradiolink_tpu.ops.rotator import Rotator
from qradiolink_tpu.ops.analog import (
    QuadratureDemod, FrequencyMod, PhaseMod, DcBlocker, Emphasis)
from qradiolink_tpu.ops.iir import FirstOrderIir, SinglePoleIir, linear_recurrence
from qradiolink_tpu.ops.agc import Agc2
from qradiolink_tpu.ops.squelch import PowerSquelch, CtcssSquelch
from qradiolink_tpu.ops.spectrum import SpectrumProbe, rssi_dbm
from conftest import run_chunked


def test_rotator_shifts_frequency(rng):
    fs = 48000.0
    t = np.arange(4800) / fs
    x = np.exp(2j * np.pi * 1000.0 * t).astype(np.complex64)
    rot = Rotator(2 * np.pi * 2000.0 / fs)
    y = np.asarray(rot.one_shot(jnp.asarray(x)))
    spec = np.fft.fft(y)
    peak = np.fft.fftfreq(len(y), 1 / fs)[np.argmax(np.abs(spec))]
    assert abs(peak - 3000.0) < 20.0


def test_rotator_block_invariance(rng):
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)).astype(np.complex64)
    rot = Rotator(0.12345)
    y_full = np.asarray(rot.one_shot(jnp.asarray(x)))
    y_chunks = run_chunked(rot, x, 8)
    np.testing.assert_allclose(y_full, y_chunks, rtol=1e-4, atol=1e-4)


def test_quadrature_demod_constant_tone():
    fs, f0 = 48000.0, 3000.0
    t = np.arange(2000) / fs
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    gain = 1.0
    qd = QuadratureDemod(gain)
    y = np.asarray(qd.one_shot(jnp.asarray(x)))[10:]
    expected = 2 * np.pi * f0 / fs
    np.testing.assert_allclose(y, expected, rtol=1e-3)


def test_fm_mod_demod_roundtrip(rng):
    fs = 48000.0
    msg = np.sin(2 * np.pi * 400.0 * np.arange(4800) / fs).astype(np.float32)
    sens = 2 * np.pi * 5000.0 / fs
    fm = FrequencyMod(sens)
    qd = QuadratureDemod(1.0 / sens)
    x = fm.one_shot(jnp.asarray(msg))
    y = np.asarray(qd.one_shot(x))
    np.testing.assert_allclose(y[10:], msg[10:], atol=5e-3)


def test_frequency_mod_block_invariance(rng):
    msg = rng.standard_normal(1200).astype(np.float32) * 0.3
    fm = FrequencyMod(0.3)
    y_full = np.asarray(fm.one_shot(jnp.asarray(msg)))
    y_chunks = run_chunked(fm, msg, 6)
    np.testing.assert_allclose(y_full, y_chunks, atol=2e-4)


def test_phase_mod():
    x = np.asarray([0.0, np.pi / 2])
    y = np.asarray(PhaseMod(1.0).one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, [1.0, 1j], atol=1e-6)


def test_first_order_iir_vs_scipy(rng):
    x = rng.standard_normal(300).astype(np.float32)
    b0, b1, a1 = 0.3, -0.2, 0.85
    blk = FirstOrderIir(b0, b1, a1)
    y = np.asarray(blk.one_shot(jnp.asarray(x)))
    ref = sps.lfilter([b0, b1], [1.0, -a1], x)
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-4)


def test_first_order_iir_block_invariance(rng):
    x = rng.standard_normal(400).astype(np.float32)
    blk = FirstOrderIir(0.1, 0.05, 0.9)
    ref = sps.lfilter([0.1, 0.05], [1.0, -0.9], x)
    y = run_chunked(blk, x, 5)
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-4)


def test_single_pole_iir(rng):
    x = rng.standard_normal(200).astype(np.float32)
    alpha = 0.04
    y = np.asarray(SinglePoleIir(alpha).one_shot(jnp.asarray(x)))
    ref = sps.lfilter([alpha], [1.0, -(1 - alpha)], x)
    np.testing.assert_allclose(y, ref, rtol=1e-3, atol=1e-4)


def test_linear_recurrence_batched(rng):
    a = 0.9
    u = rng.standard_normal((4, 100)).astype(np.float32)
    y0 = np.zeros(4, np.float32)
    y = np.asarray(linear_recurrence(jnp.float32(a), jnp.asarray(u), jnp.asarray(y0)))
    for i in range(4):
        ref = sps.lfilter([1.0], [1.0, -a], u[i])
        np.testing.assert_allclose(y[i], ref, rtol=1e-3, atol=1e-4)


def test_dc_blocker(rng):
    x = (rng.standard_normal(4000) + 5.0).astype(np.float32)
    y = np.asarray(DcBlocker(0.99).one_shot(jnp.asarray(x)))
    assert abs(np.mean(y[2000:])) < 0.05


def test_deemphasis_attenuates_highs():
    fs = 20000.0
    t = np.arange(4000) / fs
    lo = np.sin(2 * np.pi * 300.0 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 6000.0 * t).astype(np.float32)
    em = Emphasis(fs, tau=50e-6, mode="de")
    y_lo = np.asarray(em.one_shot(jnp.asarray(lo)))
    y_hi = np.asarray(em.one_shot(jnp.asarray(hi)))
    g_lo = np.std(y_lo[1000:]) / np.std(lo[1000:])
    g_hi = np.std(y_hi[1000:]) / np.std(hi[1000:])
    assert g_hi < 0.5 * g_lo


def test_preemphasis_boosts_highs():
    fs = 8000.0
    t = np.arange(4000) / fs
    lo = np.sin(2 * np.pi * 200.0 * t).astype(np.float32)
    hi = np.sin(2 * np.pi * 2500.0 * t).astype(np.float32)
    em = Emphasis(fs, tau=1e-3, mode="pre")
    g_lo = np.std(np.asarray(em.one_shot(jnp.asarray(lo)))[1000:])
    g_hi = np.std(np.asarray(em.one_shot(jnp.asarray(hi)))[1000:])
    assert g_hi > 2.0 * g_lo


def test_agc2_converges(rng):
    x = (0.01 * np.exp(2j * np.pi * 0.01 * np.arange(4000))).astype(np.complex64)
    agc = Agc2(attack_rate=1e-1, decay_rate=1e-1, reference=1.0)
    y = np.asarray(agc.one_shot(jnp.asarray(x)))
    assert abs(np.mean(np.abs(y[2000:])) - 1.0) < 0.1


def test_agc2_block_invariance(rng):
    x = (rng.standard_normal(800) + 1j * rng.standard_normal(800)).astype(np.complex64) * 0.1
    agc = Agc2(1e-2, 1e-3, 1.0)
    y_full = np.asarray(agc.one_shot(jnp.asarray(x)))
    y_chunks = run_chunked(agc, x, 4)
    np.testing.assert_allclose(y_full, y_chunks, rtol=1e-4, atol=1e-5)


def test_power_squelch_gates_noise():
    strong = np.ones(1000, np.complex64)
    weak = np.full(1000, 1e-8, np.complex64)
    sq = PowerSquelch(threshold_db=-40.0, alpha=0.01)
    y_strong = np.asarray(sq.one_shot(jnp.asarray(strong)))
    y_weak = np.asarray(sq.one_shot(jnp.asarray(weak)))
    assert np.abs(y_strong[-100:]).mean() > 0.9
    assert np.abs(y_weak[-100:]).mean() < 1e-6


def test_ctcss_squelch():
    fs = 8000.0
    t = np.arange(8000) / fs
    tone = 0.15 * np.sin(2 * np.pi * 88.5 * t)
    voice = 0.5 * np.sin(2 * np.pi * 1000.0 * t)
    with_tone = (tone + voice).astype(np.float32)
    without = voice.astype(np.float32)
    sq = CtcssSquelch(fs, 88.5, level=0.01, window=400)
    y1 = np.asarray(sq.one_shot(jnp.asarray(with_tone)))
    y2 = np.asarray(sq.one_shot(jnp.asarray(without)))
    assert np.abs(y1[2000:]).mean() > 0.1   # passes with tone
    assert np.abs(y2[2000:]).mean() < 1e-6  # gated without tone


def test_spectrum_probe_peak():
    fs = 48000.0
    t = np.arange(2048) / fs
    x = np.exp(2j * np.pi * 6000.0 * t).astype(np.complex64)
    probe = SpectrumProbe(1024)
    spec = np.asarray(probe(jnp.asarray(x)))
    freqs = np.fft.fftshift(np.fft.fftfreq(1024, 1 / fs))
    assert abs(freqs[np.argmax(spec)] - 6000.0) < fs / 1024 * 1.5


def test_rssi_dbm():
    x = np.full(1000, 0.1 + 0j, np.complex64)
    db = float(rssi_dbm(jnp.asarray(x)))
    assert abs(db - (-20.0)) < 0.1


def test_rssi_probe_matches_reference_step_response(rng):
    """RssiProbe vs a direct per-sample simulation of the reference
    pipeline (rssi_block.cpp:25-50: mag^2 -> moving SUM 2000 -> IIR
    alpha=0.04 -> 10log10 + cal) — exact at every sample, across
    uneven block splits, through a power step (squelch-latency
    semantics)."""
    from qradiolink_tpu.ops.spectrum import RssiProbe

    L, alpha, cal = 200, 0.04, -30.0   # shorter window, same structure
    T = 1000
    amp = np.where(np.arange(T) < 400, 0.01, 0.5)  # power step at t=400
    x = (amp * (rng.standard_normal(T) + 1j * rng.standard_normal(T))
         ).astype(np.complex64)

    # reference-style per-sample simulation
    p = np.abs(x) ** 2
    hist = np.zeros(L)
    y = 0.0
    ref = np.zeros(T)
    for t in range(T):
        hist = np.roll(hist, -1)
        hist[-1] = p[t]
        ma = hist.sum()
        y = (1 - alpha) * y + alpha * ma
        ref[t] = 10 * np.log10(y + 1e-20) + cal

    probe = RssiProbe(avg_len=L, alpha=alpha, cal_offset_db=cal)
    st = probe.init_state()
    out = []
    for a, b in ((0, 123), (123, 400), (400, 401), (401, T)):  # uneven blocks
        st, db = probe(st, jnp.asarray(x[a:b]))
        out.append(np.asarray(db))
    got = np.concatenate(out)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_rotator_pair_matches_complex(rng):
    from qradiolink_tpu.core import IqPair
    from qradiolink_tpu.ops.rotator import Rotator

    x = (rng.standard_normal(5000) + 1j * rng.standard_normal(5000)) \
        .astype(np.complex64)
    rot = Rotator.from_offset(12_345.0, 1_000_000.0)
    st0 = rot.init_state()
    st_c, y_c = rot(st0, jnp.asarray(x))
    st_p, y_p = rot(st0, IqPair(jnp.asarray(x.real), jnp.asarray(x.imag)))
    np.testing.assert_allclose(np.asarray(y_p.to_complex()),
                               np.asarray(y_c), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(st_p), np.asarray(st_c))
