import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.sync.costas import CostasLoop, loop_gains
from qradiolink_tpu.sync.fll import FllBandEdge
from qradiolink_tpu.sync.symbol_sync import SymbolSync
from qradiolink_tpu.sync.slicer import binary_slicer, Fsk4Discriminator
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import fir_filter


def make_bpsk(rng, n_sym, sps, rolloff=0.35):
    bits = rng.integers(0, 2, n_sym)
    syms = 2.0 * bits - 1.0
    up = np.zeros(n_sym * sps)
    up[::sps] = syms
    rrc = firdes.root_raised_cosine(float(sps), float(sps), 1.0, rolloff,
                                    11 * sps + 1)
    x = np.convolve(up, rrc)[: len(up)]
    return bits, x.astype(np.complex64)


def test_loop_gains_positive():
    a, b = loop_gains(0.05)
    assert 0 < b < a < 1


def test_costas_bpsk_locks_phase_offset(rng):
    bits, x = make_bpsk(rng, 2000, 4)
    # matched filter + downsample to symbols
    rrc = firdes.root_raised_cosine(1.0, 4.0, 1.0, 0.35, 45)
    y = np.convolve(x, rrc)[22:22 + len(x)][::4]
    y = (y * np.exp(1j * 0.7)).astype(np.complex64)  # static phase offset
    loop = CostasLoop(2 * np.pi / 100, order=2)
    _, out = loop(loop.init_state(), jnp.asarray(y))
    out = np.asarray(out)[500:]
    # after lock, symbols should be on the real axis (mod sign)
    assert np.mean(np.abs(out.imag)) < 0.15 * np.mean(np.abs(out.real))


def test_costas_qpsk_locks(rng):
    n = 4000
    syms = np.exp(1j * (np.pi / 4 + np.pi / 2 * rng.integers(0, 4, n)))
    y = (syms * np.exp(1j * 0.3)).astype(np.complex64)
    loop = CostasLoop(2 * np.pi / 100, order=4)
    _, out = loop(loop.init_state(), jnp.asarray(y))
    out = np.asarray(out)[2000:]
    # locked QPSK: |real| ~ |imag| ~ 0.707, phases near odd multiples of 45
    ang = np.angle(out) % (np.pi / 2)
    err = np.minimum(np.abs(ang - np.pi / 4), np.pi / 4)
    assert np.mean(err) < 0.1


def test_costas_small_freq_offset_tracked(rng):
    bits, x = make_bpsk(rng, 4000, 4)
    rrc = firdes.root_raised_cosine(1.0, 4.0, 1.0, 0.35, 45)
    y = np.convolve(x, rrc)[22:22 + len(x)][::4]
    f = 0.001  # rad/sample residual carrier
    y = (y * np.exp(1j * f * np.arange(len(y)))).astype(np.complex64)
    loop = CostasLoop(2 * np.pi / 100, order=2)
    _, out = loop(loop.init_state(), jnp.asarray(y))
    out = np.asarray(out)[1000:]
    assert np.mean(np.abs(out.imag)) < 0.2 * np.mean(np.abs(out.real))


def test_fll_corrects_offset(rng):
    bits, x = make_bpsk(rng, 4000, 4)
    f0 = 0.02  # rad/sample frequency offset
    y = (x * np.exp(1j * f0 * np.arange(len(x)))).astype(np.complex64)
    fll = FllBandEdge(4, 0.35, 32, 8 * np.pi / 100, sub_block=500)
    st = fll.init_state()
    st, out = fll(st, jnp.asarray(y))
    # converged loop frequency should approach -f0 (derotation)
    freq = float(np.asarray(st[1]))
    assert abs(freq - f0) < 0.01, f"FLL freq {freq} vs offset {f0}"


def test_symbol_sync_recovers_bpsk_timing(rng):
    sps = 10
    bits, x = make_bpsk(rng, 1500, sps)
    # matched filter (RC cascade -> zero ISI at symbol instants)
    mf = firdes.root_raised_cosine(1.0, float(sps), 1.0, 0.35, 11 * sps + 1)
    x = np.convolve(x, mf)[55: 55 + len(x)]
    # off-grid sampling phase
    x = np.roll(x, 3).astype(np.complex64)
    ss = SymbolSync(sps, decisions=None)
    _, syms = ss(ss.init_state(), jnp.asarray(x))
    syms = np.asarray(syms)
    assert syms.shape[-1] == 1500
    tail = syms[700:]
    # decisions should be strongly bimodal on the real axis
    assert np.mean(np.abs(np.abs(tail.real) - 1.0) < 0.3) > 0.95


def test_symbol_sync_float_4level(rng):
    sps = 10
    levels = np.array([-1.5, -0.5, 0.5, 1.5])
    n_sym = 1200
    syms = levels[rng.integers(0, 4, n_sym)]
    up = np.zeros(n_sym * sps)
    up[::sps] = syms
    rrc = firdes.root_raised_cosine(float(sps), float(sps), 1.0, 0.2,
                                    10 * sps + 1)
    x = np.convolve(up, rrc)[: len(up)].astype(np.float32)
    rrc_rx = firdes.root_raised_cosine(1.0, float(sps), 1.0, 0.2, 10 * sps + 1)
    x = np.convolve(x, rrc_rx)[5 * sps: 5 * sps + len(x)].astype(np.float32)
    ss = SymbolSync(sps, decisions=levels,
                    omega_limit=0.05)
    _, out = ss(ss.init_state(), jnp.asarray(x))
    out = np.asarray(out)[600:]
    dists = np.min(np.abs(out[:, None] - levels), axis=1)
    assert np.median(dists) < 0.25, f"median dist {np.median(dists)}"


def test_symbol_sync_block_invariance(rng):
    sps = 8
    bits, x = make_bpsk(rng, 800, sps)
    ss = SymbolSync(sps, decisions=None)
    _, full = ss(ss.init_state(), jnp.asarray(x))
    st = ss.init_state()
    outs = []
    for part in np.split(x, 4):
        st, o = ss(st, jnp.asarray(part))
        outs.append(np.asarray(o))
    chunked = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(np.asarray(full), chunked, atol=1e-2)


def test_binary_slicer():
    y = np.asarray(binary_slicer(jnp.asarray([-0.5, 0.2, -0.1, 3.0])))
    np.testing.assert_array_equal(y, [0, 1, 0, 1])


def test_fsk4_discriminator():
    mags = np.zeros((4, 5), np.float32)
    winners = [0, 3, 1, 2, 3]
    for t, w in enumerate(winners):
        mags[w, t] = 1.0
    d = Fsk4Discriminator()
    pts = np.asarray(d(jnp.asarray(mags)))
    expect = np.asarray(d.points)[winners]
    np.testing.assert_allclose(pts, expect)
