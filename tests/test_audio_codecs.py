"""Codec bridge tests (Codec2/Opus via system libraries). Vocoders do
not preserve waveforms, so assertions are on frame geometry (bitrates
must match the reference's over-the-air frame budgets,
audioencoder.cpp:47-67) and on dominant-pitch recovery."""

import numpy as np
import pytest

from qradiolink_tpu.audio.codecs import (
    AudioEncoder, Codec2, Opus, codec2_available, opus_available)

pytestmark = pytest.mark.skipif(
    not (codec2_available() and opus_available()),
    reason="system codec libraries not present")


def _voiceish(n, f0=200.0):
    """Harmonic-rich periodic signal (vocoder-friendly)."""
    t = np.arange(n) / 8000.0
    x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in (1, 2, 3, 4))
    return (4000 * x / np.max(np.abs(x))).astype(np.int16)


def _dominant_freq(pcm):
    spec = np.abs(np.fft.rfft(pcm.astype(float) * np.hanning(len(pcm))))
    f = np.fft.rfftfreq(len(pcm), 1 / 8000.0)
    band = (f > 80) & (f < 1000)
    return f[band][np.argmax(spec[band])]


@pytest.mark.parametrize("rate,spf,bpf", [
    (700, 320, 4), (1400, 320, 7), (2400, 160, 6), (3200, 160, 8)])
def test_codec2_frame_geometry_and_pitch(rate, spf, bpf):
    c = Codec2(rate)
    assert (c.samples_per_frame, c.bytes_per_frame) == (spf, bpf)
    pcm = _voiceish(spf * 16)
    enc = c.encode(pcm)
    assert len(enc) == 16 * bpf            # exact over-the-air budget
    dec = c.decode(enc)
    assert dec.size == pcm.size
    # pitch survives the vocoder round trip (low-rate modes may move
    # dominant energy to a harmonic of f0)
    fd = _dominant_freq(dec[spf * 4:])
    harmonic_err = min(abs(fd - 200.0 * k) for k in (1, 2, 3))
    assert harmonic_err < 40.0, fd
    assert dec[spf * 4:].std() > 200     # non-silent synthesis


def test_opus_radio_profile():
    o = Opus()
    pcm = _voiceish(320)
    pkt = o.encode(pcm)
    # CBR 9400 bit/s, 40 ms frame -> 47 bytes (reference radio profile)
    assert len(pkt) == 47
    dec = o.decode(pkt)
    assert dec.size == 320


def test_audio_encoder_facade():
    enc = AudioEncoder()
    pcm = _voiceish(320)
    data = enc.encode_dmr(pcm[:160])
    assert len(data) == 8                  # codec2 3200 fallback
    out = enc.decode_dmr(data)
    assert out.size == 160
    v = enc.encode_codec2(pcm, 1400)
    assert len(v) == 7
