import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.ops.channelizer import PfbChannelizer, PfbSynthesizer
from conftest import run_chunked


def tones_at_channels(fs, M, T, chans, amps=None):
    t = np.arange(T) / fs
    x = np.zeros(T, np.complex64)
    spacing = fs / M
    for i, k in enumerate(chans):
        f = k * spacing if k < M / 2 else (k - M) * spacing
        a = 1.0 if amps is None else amps[i]
        x += a * np.exp(2j * np.pi * f * t).astype(np.complex64)
    return x


def test_channelizer_separates_tones():
    fs, M, T = 250_000.0, 10, 250_000 // 10 * 10 * 2
    chans = [1, 4, 7]
    x = tones_at_channels(fs, M, T, chans)
    blk = PfbChannelizer(M)
    y = np.asarray(blk.one_shot(jnp.asarray(x)))  # (M, T/M)
    assert y.shape == (M, T // M)
    powers = np.mean(np.abs(y[:, 1000:]) ** 2, axis=-1)
    for k in range(M):
        if k in chans:
            assert powers[k] > 0.5, f"channel {k} should carry a tone: {powers}"
        else:
            assert powers[k] < 0.01, f"channel {k} should be empty: {powers}"


def test_channelizer_block_invariance(rng):
    M, T = 8, 8 * 256
    x = (rng.standard_normal(T) + 1j * rng.standard_normal(T)).astype(np.complex64)
    blk = PfbChannelizer(M)
    s = blk.init_state()
    _, y_full = blk(s, jnp.asarray(x))
    y_full = np.asarray(y_full)
    # chunked
    state = blk.init_state()
    outs = []
    for c in np.split(x, 4):
        state, y = blk(state, jnp.asarray(c))
        outs.append(np.asarray(y))
    y_chunks = np.concatenate(outs, axis=-1)
    np.testing.assert_allclose(y_full, y_chunks, rtol=1e-4, atol=1e-5)


def test_synthesizer_places_tones():
    fs_ch, M, Tm = 25_000.0, 10, 4096
    t = np.arange(Tm) / fs_ch
    s = np.zeros((M, Tm), np.complex64)
    s[2] = np.exp(2j * np.pi * 1000.0 * t)  # baseband tone in channel 2
    blk = PfbSynthesizer(M)
    y = np.asarray(blk.one_shot(jnp.asarray(s)))
    assert y.shape == (M * Tm,)
    fs = fs_ch * M
    spec = np.abs(np.fft.fft(y[5000:]))
    freqs = np.fft.fftfreq(len(y) - 5000, 1 / fs)
    peak_f = freqs[np.argmax(spec)]
    expected = 2 * (fs / M) + 1000.0
    assert abs(peak_f - expected) < 100.0


def test_channelizer_synthesizer_roundtrip(rng):
    """Synthesize channels -> channelize back: recover each channel stream."""
    M, Tm = 8, 4096
    fs_ch = 24000.0
    t = np.arange(Tm) / fs_ch
    s = np.zeros((M, Tm), np.complex64)
    used = [0, 3, 6]
    for i, k in enumerate(used):
        s[k] = np.exp(2j * np.pi * (300.0 + 200.0 * i) * t)
    syn = PfbSynthesizer(M)
    y = syn.one_shot(jnp.asarray(s))
    chan = PfbChannelizer(M)
    r = np.asarray(chan.one_shot(y))
    powers = np.mean(np.abs(r[:, 1024:]) ** 2, axis=-1)
    for k in range(M):
        if k in used:
            assert powers[k] > 0.3, powers
        else:
            assert powers[k] < 0.02, powers


def test_channelizer_pair_matches_complex(rng):
    """IqPair plane path (matmul IDFT) vs complex path (fft) must agree."""
    from qradiolink_tpu.core import IqPair
    from qradiolink_tpu.ops.channelizer import PfbChannelizer

    x = (rng.standard_normal(4000) + 1j * rng.standard_normal(4000)) \
        .astype(np.complex64)
    ch_c = PfbChannelizer(10)
    ch_p = PfbChannelizer(10)
    st_c, y_c = ch_c(ch_c.init_state(), jnp.asarray(x))
    st_p, y_p = ch_p(ch_p.init_state(),
                     IqPair(jnp.asarray(x.real), jnp.asarray(x.imag)))
    np.testing.assert_allclose(np.asarray(y_p.to_complex()), np.asarray(y_c),
                               rtol=1e-4, atol=1e-5)
    # carried states agree plane-wise too (streaming equivalence)
    for a, b in zip(jax.tree_util.tree_leaves(st_c),
                    jax.tree_util.tree_leaves(st_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
