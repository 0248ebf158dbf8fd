import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.ops.resample import RationalResampler, design_resampler_taps
from conftest import run_chunked


def ref_resample(x, taps, L, M):
    """Zero-stuff -> convolve -> decimate reference (x[<0] = 0)."""
    u = np.zeros(len(x) * L, dtype=x.dtype if np.iscomplexobj(x) else np.float64)
    u[::L] = x
    y = np.convolve(u, taps)[: len(u)]
    return y[::M][: len(x) * L // M]


@pytest.mark.parametrize("L,M", [(1, 50), (2, 5), (125, 3), (3, 125), (1, 5), (24, 25)])
def test_resampler_matches_reference(rng, L, M):
    T = 4 * M * 5
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(np.complex64)
    taps = rng.standard_normal(8 * max(L, 1) + 3).astype(np.float32)
    blk = RationalResampler(L, M, taps=taps)
    y = np.asarray(blk.one_shot(jnp.asarray(x)))
    ref = ref_resample(x, taps, L, M)
    assert y.shape[-1] == T * L // M
    np.testing.assert_allclose(y, ref.astype(np.complex64), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("L,M", [(1, 4), (5, 2), (7, 3)])
def test_resampler_block_invariance(rng, L, M):
    T = 8 * M * 3
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(np.complex64)
    taps = rng.standard_normal(6 * L + 1).astype(np.float32)
    blk = RationalResampler(L, M, taps=taps)
    y = run_chunked(blk, x, 4)
    ref = ref_resample(x, taps, L, M)
    np.testing.assert_allclose(y, ref.astype(np.complex64), rtol=1e-3, atol=1e-4)


def test_resampler_default_taps_tone():
    """Decimating a clean tone by 50 should keep the tone, kill aliases."""
    fs = 1_000_000
    T = 50 * 400
    t = np.arange(T) / fs
    f0 = 3000.0
    x = np.exp(2j * np.pi * f0 * t).astype(np.complex64)
    blk = RationalResampler(1, 50)
    y = np.asarray(blk.one_shot(jnp.asarray(x)))[100:]  # drop transient
    fs2 = fs / 50
    spec = np.fft.fft(y)
    freqs = np.fft.fftfreq(len(y), 1 / fs2)
    peak = freqs[np.argmax(np.abs(spec))]
    assert abs(peak - f0) < fs2 / len(y) * 2


def test_resampler_gcd_reduction():
    blk = RationalResampler(4, 2)
    assert blk.L == 2 and blk.M == 1


def test_design_taps_gain():
    taps = design_resampler_taps(4, 1)
    assert abs(np.sum(taps) - 4.0) < 1e-3  # DC gain == interpolation
