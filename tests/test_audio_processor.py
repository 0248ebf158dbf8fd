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


# ---------------------------------------------------------------- denoiser
def test_denoiser_drops_noise_floor():
    """A/B spectral test: stationary noise floor must drop >= 10 dB while
    an in-band tone is preserved (the Speex DENOISE/-45 dB role,
    reference audioprocessor.cpp:27-52)."""
    from qradiolink_tpu.audio.processor import Denoiser

    rng = np.random.default_rng(7)
    fs = 8000
    t = np.arange(fs * 4) / fs
    tone = 0.5 * np.sin(2 * np.pi * 800 * t)
    # speech-like amplitude gating: tone active in bursts
    gate = (np.sin(2 * np.pi * 0.7 * t) > 0).astype(float)
    noise = 0.05 * rng.standard_normal(len(t))
    x = tone * gate + noise

    dn = Denoiser(fs)
    # process in 320-sample frames like the capture path
    out = np.concatenate([dn.process(x[i:i + 320])
                          for i in range(0, len(x), 320)])
    # analyze the second half (noise model converged); compare noise
    # power away from the tone bin
    half = len(out) // 2
    spec_in = np.abs(np.fft.rfft(x[half:half + 8192])) ** 2
    spec_out = np.abs(np.fft.rfft(out[half:half + 8192])) ** 2
    freqs = np.fft.rfftfreq(8192, 1 / fs)
    noise_band = (freqs > 1500) & (freqs < 3500)
    drop_db = 10 * np.log10(spec_in[noise_band].sum()
                            / max(spec_out[noise_band].sum(), 1e-20))
    assert drop_db >= 10.0, f"noise floor only dropped {drop_db:.1f} dB"
    # tone band preserved within 3 dB
    tone_band = (freqs > 700) & (freqs < 900)
    keep_db = 10 * np.log10(spec_out[tone_band].sum()
                            / spec_in[tone_band].sum())
    assert keep_db > -3.0, f"tone attenuated {keep_db:.1f} dB"


def test_denoiser_agc_converges_to_target():
    from qradiolink_tpu.audio.processor import Denoiser

    rng = np.random.default_rng(3)
    fs = 8000
    dn = Denoiser(fs, denoise=False, agc=True, agc_target=0.1,
                  agc_attack=1, agc_decay=20)
    t = np.arange(fs * 3) / fs
    x = 0.01 * np.sin(2 * np.pi * 700 * t)  # quiet input
    outs = [dn.process(x[i:i + 320]) for i in range(0, len(x), 320)]
    rms_tail = float(np.sqrt(np.mean(np.concatenate(outs[-10:]) ** 2)))
    assert 0.05 < rms_tail < 0.2  # pulled toward target 0.1


def test_write_preprocess_with_denoise_path():
    from qradiolink_tpu.audio.processor import AudioProcessor

    rng = np.random.default_rng(5)
    ap = AudioProcessor(denoise=True)
    y = ap.write_preprocess(rng.standard_normal(640).astype(np.float32) * 0.1,
                            AudioProcessor.AUDIO_MODE_ANALOG, compress=False)
    assert y.shape == (640,)
    assert np.isfinite(y).all()
