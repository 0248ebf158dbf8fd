import numpy as np

from qradiolink_tpu.ops import firdes


def freq_response(h, fs, f):
    n = np.arange(len(h))
    return np.abs(np.sum(h * np.exp(-2j * np.pi * f / fs * n)))


def test_low_pass_response():
    fs, cutoff, trans = 48000.0, 3000.0, 1000.0
    h = firdes.low_pass(1.0, fs, cutoff, trans, firdes.WIN_HAMMING)
    assert len(h) % 2 == 1
    assert abs(freq_response(h, fs, 0.0) - 1.0) < 1e-3        # DC gain
    assert freq_response(h, fs, 1000.0) > 0.99                # passband
    assert freq_response(h, fs, cutoff + trans) < 10 ** (-40 / 20)  # stopband


def test_low_pass_gain():
    h = firdes.low_pass(2.5, 20000.0, 3500.0, 500.0, firdes.WIN_BLACKMAN_HARRIS)
    assert abs(freq_response(h, 20000.0, 0.0) - 2.5) < 1e-2


def test_high_pass():
    fs = 8000.0
    h = firdes.high_pass(1.0, fs, 300.0, 100.0)
    assert freq_response(h, fs, 0.0) < 0.01
    assert abs(freq_response(h, fs, fs / 2) - 1.0) < 0.01
    assert freq_response(h, fs, 1000.0) > 0.95


def test_band_pass():
    fs = 8000.0
    h = firdes.band_pass(1.0, fs, 300.0, 3000.0, 200.0)
    assert freq_response(h, fs, 0.0) < 0.02
    assert abs(freq_response(h, fs, 1650.0) - 1.0) < 0.02
    assert freq_response(h, fs, 3600.0) < 0.02


def test_complex_band_pass_one_sided():
    fs = 8000.0
    h = firdes.complex_band_pass(1.0, fs, 200.0, 2700.0, 200.0)
    assert h.dtype == np.complex64
    n = np.arange(len(h))

    def resp(f):
        return np.abs(np.sum(h * np.exp(-2j * np.pi * f / fs * n)))

    assert resp(1500.0) > 0.98       # USB passband
    assert resp(-1500.0) < 0.02      # LSB rejected (one-sided)


def test_rrc_isi():
    # RRC * RRC = raised cosine -> (near) zero ISI at symbol spacing
    sps = 10
    h = firdes.root_raised_cosine(1.0, 1.0 * sps, 1.0, 0.35, 11 * sps + 1)
    rc = np.convolve(h, h)
    center = len(rc) // 2
    peak = rc[center]
    for k in range(1, 5):
        assert abs(rc[center + k * sps]) < 0.01 * abs(peak)
        assert abs(rc[center - k * sps]) < 0.01 * abs(peak)


def test_compute_ntaps_window_order():
    # sharper windows need more taps
    n_h = firdes.compute_ntaps(48000, 1000, firdes.WIN_HAMMING)
    n_bh = firdes.compute_ntaps(48000, 1000, firdes.WIN_BLACKMAN_HARRIS)
    assert n_bh > n_h
    assert n_h % 2 == 1 and n_bh % 2 == 1


def test_gaussian_taps():
    h = firdes.gaussian(1.0, 4, 0.35, 4 * 4)
    assert abs(np.sum(h) - 1.0) < 1e-4
    assert np.argmax(h) == len(h) // 2
