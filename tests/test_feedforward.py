"""Feedforward sync tests: the block-parallel estimators must recover
timing/carrier/gain with accuracy comparable to the feedback loops."""

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.ops import firdes
from qradiolink_tpu.sync.feedforward import (
    block_agc, vv_carrier_correct, om_timing_estimate, farrow_delay,
    FeedforwardSymbolSync)


def make_shaped_bpsk(rng, n_sym, sps, alpha=0.35, delay_frac=0.0):
    bits = rng.integers(0, 2, n_sym)
    syms = 2.0 * bits - 1.0
    up = np.zeros(n_sym * sps)
    up[::sps] = syms
    rrc = firdes.root_raised_cosine(float(sps), float(sps), 1.0, alpha,
                                    10 * sps + 1)
    x = np.convolve(up, rrc)
    mf = firdes.root_raised_cosine(1.0, float(sps), 1.0, alpha, 10 * sps + 1)
    x = np.convolve(x, mf)[10 * sps: 10 * sps + n_sym * sps]
    if delay_frac:
        # fractional delay via fine upsampled roll
        from scipy.signal import resample_poly
        up16 = resample_poly(x, 16, 1)
        up16 = np.roll(up16, int(round(delay_frac * 16)))
        x = resample_poly(up16, 1, 16)
    return bits, x.astype(np.complex64)


def test_block_agc_normalizes():
    rng = np.random.default_rng(0)
    x = (3.7 * (rng.standard_normal(4096) + 1j * rng.standard_normal(4096))
         ).astype(np.complex64)
    y = np.asarray(block_agc(jnp.asarray(x), reference=1.0, n_sub=16))
    rms = np.sqrt(np.mean(np.abs(y) ** 2))
    assert abs(rms - 1.0) < 0.02


def test_om_timing_estimates_known_delay():
    rng = np.random.default_rng(1)
    sps = 10
    for d in (0, 2, 5, 7):
        bits, x = make_shaped_bpsk(rng, 800, sps)
        x = np.concatenate([np.zeros(d, np.complex64), x[:-d if d else None]])
        tau = np.asarray(om_timing_estimate(jnp.asarray(x), sps, n_sub=4))
        # all sub-blocks should agree on the shift (mod sps)
        err = np.abs((tau - d + sps / 2) % sps - sps / 2)
        assert err.max() < 0.35, f"delay {d}: tau {tau}"


def test_vv_carrier_removes_phase_offset():
    rng = np.random.default_rng(2)
    sps = 10
    bits, x = make_shaped_bpsk(rng, 1600, sps)
    x = x * np.exp(1j * 1.1).astype(np.complex64)
    y, ph = vv_carrier_correct(jnp.asarray(x), order=2, n_sub=16)
    y = np.asarray(y)
    # symbol-rate samples should be near the real axis after correction
    rot = np.abs(np.angle(y[np.abs(y) > 0.5]))
    rot = np.minimum(rot, np.pi - rot)  # BPSK 180-deg ambiguity
    assert np.median(rot) < 0.15


def test_vv_carrier_tracks_small_cfo():
    rng = np.random.default_rng(3)
    sps = 10
    bits, x = make_shaped_bpsk(rng, 1600, sps)
    t = np.arange(len(x))
    x = (x * np.exp(2j * np.pi * 1e-5 * t)).astype(np.complex64)  # slow CFO
    y, _ = vv_carrier_correct(jnp.asarray(x), order=2, n_sub=16)
    y = np.asarray(y)
    rot = np.abs(np.angle(y[np.abs(y) > 0.5]))
    rot = np.minimum(rot, np.pi - rot)
    assert np.median(rot) < 0.2


def test_farrow_delay_interpolates_sine():
    t = np.arange(256, dtype=np.float64)
    x = np.sin(2 * np.pi * 0.01 * t).astype(np.complex64)
    mu = jnp.full(256, 0.5, jnp.float32)
    y = np.asarray(farrow_delay(jnp.asarray(x), mu))
    ref = np.sin(2 * np.pi * 0.01 * (t[:253] + 1 + 0.5))
    np.testing.assert_allclose(y.real, ref, atol=1e-3)


def test_ff_symbol_sync_recovers_bpsk():
    rng = np.random.default_rng(4)
    sps = 10
    for d in (0, 3, 7):
        bits, x = make_shaped_bpsk(rng, 800, sps)
        x = np.concatenate([np.zeros(d, np.complex64),
                            x[:-d if d else None]])
        ss = FeedforwardSymbolSync(sps, n_sub=4)
        _, syms = ss(ss.init_state(), jnp.asarray(x))
        syms = np.asarray(syms)
        assert syms.shape[-1] == 800
        core = syms[20:-20]
        good = np.mean(np.abs(np.abs(core.real) - 1.0) < 0.3)
        assert good > 0.95, f"delay {d}: eye quality {good}"


def test_ff_symbol_sync_streaming_blocks():
    rng = np.random.default_rng(5)
    sps = 8
    bits, x = make_shaped_bpsk(rng, 1024, sps)
    ss = FeedforwardSymbolSync(sps, n_sub=4)
    _, full = ss(ss.init_state(), jnp.asarray(x))
    st = ss.init_state()
    outs = []
    for part in np.split(x, 4):
        st, o = ss(st, jnp.asarray(part))
        outs.append(np.asarray(o))
    chunked = np.concatenate(outs)
    # same symbol decisions in steady state (estimates per block differ
    # slightly; compare decision signs away from block edges)
    a = np.sign(np.asarray(full).real[32:-32])
    b = np.sign(chunked.real[32:-32])
    assert np.mean(a == b) > 0.98


def test_ff_symbol_sync_acc_seam_continuity():
    """Streaming in short blocks must not flip the integer symbol
    offset at block seams (a flip duplicates/drops a symbol mid-stream:
    measured ~5% BER on a CLEAN channel pre-fix). A constant ONE-symbol
    global offset is legitimate (timing near the wrap boundary is
    ±sps-ambiguous); what must hold is that a SINGLE global alignment
    fits the sent bits exactly — no mid-stream slips. The O&M bin
    accumulator carried in state pins the estimate across seams; with
    it disabled (ACC_DECAY=0 == the old stateless behavior) at least
    one near-wrap delay slips mid-stream."""
    rng = np.random.default_rng(11)
    sps = 8

    def steady_errors(decay, d):
        bits, x = make_shaped_bpsk(rng, 1024, sps)
        x = np.concatenate([np.zeros(d, np.complex64),
                            x[:-d if d else None]])
        ss = FeedforwardSymbolSync(sps, n_sub=4)
        old = FeedforwardSymbolSync.ACC_DECAY
        FeedforwardSymbolSync.ACC_DECAY = decay
        try:
            st = ss.init_state()
            outs = []
            for part in np.split(x, 16):
                st, o = ss(st, jnp.asarray(part))
                outs.append(np.asarray(o))
        finally:
            FeedforwardSymbolSync.ACC_DECAY = old
        dec = (np.concatenate(outs).real > 0).astype(np.uint8)
        sent = np.asarray(bits, np.uint8)
        # one global alignment (and polarity) must fit steady state
        lo, hi = 64, len(sent) - 64
        best = 1.0
        for off in range(-4, 5):
            seg = dec[lo + off: hi + off]
            e = np.mean(seg != sent[lo:hi])
            best = min(best, float(min(e, 1.0 - e)))
        return best

    delays = range(0, sps)
    fixed = [steady_errors(FeedforwardSymbolSync.ACC_DECAY, d)
             for d in delays]
    assert max(fixed) == 0.0, fixed
    legacy = [steady_errors(0.0, d) for d in delays]
    assert max(legacy) > 0.0, ("seam slips no longer reproduce with the "
                               "accumulator off; tighten the scenario",
                               legacy)
