import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.ops.fir import FirFilter, FftFirFilter, fir_filter
from conftest import run_chunked


def ref_fir(x, h, decim=1):
    """y[m] = sum_k h[k] x[m*decim - k], x[<0]=0."""
    y = np.convolve(x, h)[: len(x)]
    return y[::decim]


@pytest.mark.parametrize("impl", ["conv", "fft"])
def test_fir_matches_numpy_real(rng, impl):
    x = rng.standard_normal(512).astype(np.float32)
    h = rng.standard_normal(31).astype(np.float32)
    blk = FirFilter(h, impl=impl)
    y = np.asarray(blk.one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["conv", "fft"])
def test_fir_complex_input_real_taps(rng, impl):
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64)
    h = rng.standard_normal(17).astype(np.float32)
    y = np.asarray(FirFilter(h, impl=impl).one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["conv", "fft"])
def test_fir_complex_taps(rng, impl):
    x = (rng.standard_normal(256) + 1j * rng.standard_normal(256)).astype(np.complex64)
    h = (rng.standard_normal(21) + 1j * rng.standard_normal(21)).astype(np.complex64)
    y = np.asarray(FirFilter(h, impl=impl).one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("decim", [2, 5])
def test_fir_decimation(rng, decim):
    x = rng.standard_normal(500).astype(np.float32)
    h = rng.standard_normal(25).astype(np.float32)
    y = np.asarray(FirFilter(h, decim=decim).one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref_fir(x, h, decim), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("impl", ["conv", "fft"])
@pytest.mark.parametrize("nchunks", [1, 4, 8])
def test_fir_block_size_invariance(rng, impl, nchunks):
    x = (rng.standard_normal(512) + 1j * rng.standard_normal(512)).astype(np.complex64)
    h = rng.standard_normal(33).astype(np.float32)
    blk = FirFilter(h, impl=impl)
    y = run_chunked(blk, x, nchunks)
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-4, atol=1e-4)


def test_fir_decim_block_invariance(rng):
    x = rng.standard_normal(600).astype(np.float32)
    h = rng.standard_normal(41).astype(np.float32)
    blk = FirFilter(h, decim=3)
    y = run_chunked(blk, x, 4)  # chunks of 150, multiple of 3
    np.testing.assert_allclose(y, ref_fir(x, h, 3), rtol=1e-4, atol=1e-4)


def test_fft_fir_long_taps(rng):
    x = (rng.standard_normal(4096) + 1j * rng.standard_normal(4096)).astype(np.complex64)
    h = np.asarray(np.hamming(401) * np.sinc(np.linspace(-4, 4, 401)), np.float32)
    y = np.asarray(FftFirFilter(h).one_shot(jnp.asarray(x)))
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-3, atol=1e-3)


def test_fir_filter_oneshot_fn(rng):
    x = rng.standard_normal(128).astype(np.float32)
    h = rng.standard_normal(9).astype(np.float32)
    y = np.asarray(fir_filter(jnp.asarray(x), jnp.asarray(h)))
    np.testing.assert_allclose(y, ref_fir(x, h), rtol=1e-5, atol=1e-5)


def test_fir_batched(rng):
    x = rng.standard_normal((3, 256)).astype(np.float32)
    h = rng.standard_normal(15).astype(np.float32)
    blk = FirFilter(h, lead_shape=(3,))
    s = blk.init_state()
    _, y = blk(s, jnp.asarray(x))
    for i in range(3):
        np.testing.assert_allclose(np.asarray(y)[i], ref_fir(x[i], h),
                                   rtol=1e-4, atol=1e-4)


def test_slices_backend_matches_conv(rng):
    """The TPU (conv-free) backend must match the conv primitive exactly."""
    from qradiolink_tpu.ops.fir import _conv1d_real_conv, _conv1d_real_slices
    import jax.numpy as jnp
    x = rng.standard_normal(512).astype(np.float32)
    taps = rng.standard_normal(33).astype(np.float32)
    for stride in (1, 2, 5, 7):
        a = np.asarray(_conv1d_real_conv(jnp.asarray(x), jnp.asarray(taps),
                                         stride))
        b = np.asarray(_conv1d_real_slices(jnp.asarray(x), taps, stride))
        assert a.shape == b.shape, (stride, a.shape, b.shape)
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_slices_backend_batched(rng):
    from qradiolink_tpu.ops.fir import _conv1d_real_conv, _conv1d_real_slices
    import jax.numpy as jnp
    x = rng.standard_normal((3, 4, 500)).astype(np.float32)
    taps = rng.standard_normal(21).astype(np.float32)
    for stride in (1, 4):
        a = np.asarray(_conv1d_real_conv(jnp.asarray(x), jnp.asarray(taps),
                                         stride))
        b = np.asarray(_conv1d_real_slices(jnp.asarray(x), taps, stride))
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
