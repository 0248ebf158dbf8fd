"""Audio processor: sndfilter compressor port + codec band-pass + VAD
(reference src/audio/audioprocessor.cpp, src/ext/compressor.c)."""

import numpy as np

from qradiolink_tpu.audio.processor import AudioProcessor, Compressor


def _tone(n=8000, f=1000.0, amp=1.0, rate=8000):
    return (amp * np.sin(2 * np.pi * f * np.arange(n) / rate)
            ).astype(np.float32)


def test_compressor_reduces_dynamic_range():
    c = Compressor(8000, pregain=0, threshold=-30, knee=20, ratio=20,
                   attack=0.001, release=0.125)
    loud = _tone(amp=0.9)
    quiet = _tone(amp=0.02)
    out_loud = c.process(loud)[4000:]
    c2 = Compressor(8000, pregain=0, threshold=-30, knee=20, ratio=20,
                    attack=0.001, release=0.125)
    out_quiet = c2.process(quiet)[4000:]
    in_range = 20 * np.log10(0.9 / 0.02)
    out_range = 20 * np.log10(np.abs(out_loud).max()
                              / max(np.abs(out_quiet).max(), 1e-9))
    assert out_range < in_range - 10, (
        f"compression ratio too weak: {in_range:.1f} -> {out_range:.1f} dB")
    # loud signal attenuated below input, output stays bounded
    assert np.abs(out_loud).max() < 1.2


def test_compressor_attack_settles():
    c = Compressor(8000, 0, -35, 20, 20, 0.001, 0.125)
    x = _tone(16000, amp=0.8)
    y = c.process(x)
    # steady state: envelope roughly flat over the second half
    e1 = np.abs(y[8000:12000]).max()
    e2 = np.abs(y[12000:]).max()
    assert abs(e1 - e2) / e1 < 0.1


def test_codec2_bandpass_spectral_ab():
    """Mode-conditional processing: codec2 write path band-limits to
    200-3000 Hz, opus path doesn't."""
    p = AudioProcessor()
    rng = np.random.default_rng(0)
    noise = rng.standard_normal(16000).astype(np.float32) * 0.2
    y_c2 = p.write_preprocess(noise, AudioProcessor.AUDIO_MODE_CODEC2)
    p2 = AudioProcessor()
    y_op = p2.write_preprocess(noise, AudioProcessor.AUDIO_MODE_OPUS)

    def band_db(y, lo, hi):
        sp = np.abs(np.fft.rfft(y * np.hanning(len(y)))) ** 2
        f = np.fft.rfftfreq(len(y), 1 / 8000)
        return 10 * np.log10(sp[(f >= lo) & (f < hi)].mean() + 1e-12)

    # codec2 path: >3.4 kHz well below passband; opus path: flat-ish
    rej_c2 = band_db(y_c2, 500, 2500) - band_db(y_c2, 3600, 3990)
    rej_op = band_db(y_op, 500, 2500) - band_db(y_op, 3600, 3990)
    assert rej_c2 > 30, f"codec2 stopband rejection {rej_c2:.1f} dB"
    assert rej_op < 10, f"opus path unexpectedly filtered {rej_op:.1f} dB"


def test_vad_level():
    p = AudioProcessor()
    _, active = p.read_preprocess(_tone(960, amp=0.5),
                                  AudioProcessor.AUDIO_MODE_ANALOG,
                                  preprocess=False, vox_level=0.1)
    assert active
    _, active2 = p.read_preprocess(np.zeros(960, np.float32),
                                   AudioProcessor.AUDIO_MODE_ANALOG,
                                   preprocess=False, vox_level=0.1)
    assert not active2
    assert -100.0 <= p.audio_level <= 20.0
