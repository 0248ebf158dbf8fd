"""Loopback tests for the analog voice chains: TX -> AWGN channel -> RX,
assert the recovered audio contains the sent tone with good SNR."""

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.chains.nbfm import NbfmDemod, NbfmMod
from qradiolink_tpu.chains.am import AmDemod, AmMod
from qradiolink_tpu.chains.ssb import SsbDemod, SsbMod
from qradiolink_tpu.chains.wbfm import WbfmDemod
from qradiolink_tpu.chains.channel import ChannelModel


AUDIO_RATE = 8000


def tone(freq, n, rate=AUDIO_RATE, amp=0.5):
    return (amp * np.sin(2 * np.pi * freq * np.arange(n) / rate)).astype(np.float32)


def tone_snr(audio, freq, rate=AUDIO_RATE):
    """Power at tone bin vs rest (excluding DC region)."""
    a = audio - np.mean(audio)
    spec = np.abs(np.fft.rfft(a * np.hanning(len(a)))) ** 2
    freqs = np.fft.rfftfreq(len(a), 1 / rate)
    tone_band = (freqs > freq - 50) & (freqs < freq + 50)
    noise_band = (freqs > 100) & ~tone_band
    return 10 * np.log10(spec[tone_band].sum() / (spec[noise_band].sum() + 1e-12))


def run_loopback(mod, demod, audio, snr_db=30.0):
    _, tx = mod(mod.init_state(), jnp.asarray(audio))
    iq = tx["iq"]
    chan = ChannelModel(1_000_000, snr_db=snr_db)
    rx_iq = chan(iq)
    _, out = demod(demod.init_state(), rx_iq)
    return np.asarray(out["audio"])


def test_nbfm_loopback():
    audio = tone(800.0, 4000)  # 0.5 s
    out = run_loopback(NbfmMod(), NbfmDemod(), audio)
    assert out.shape[-1] == 4000
    snr = tone_snr(out[1000:], 800.0)
    assert snr > 15.0, f"NBFM audio SNR {snr:.1f} dB"


def test_nbfm_squelch_closed_on_noise():
    demod = NbfmDemod(squelch_db=-20.0)
    rng = np.random.default_rng(3)
    noise = (1e-4 * (rng.standard_normal(250000)
                     + 1j * rng.standard_normal(250000))).astype(np.complex64)
    _, out = demod(demod.init_state(), jnp.asarray(noise))
    assert np.abs(np.asarray(out["audio"])[1000:]).max() < 1e-3


def test_nbfm_rssi():
    audio = tone(800.0, 4000)
    mod = NbfmMod()
    _, tx = mod(mod.init_state(), jnp.asarray(audio))
    demod = NbfmDemod()
    _, out = demod(demod.init_state(), tx["iq"])
    rssi = float(out["rssi"])
    assert -40.0 < rssi < 10.0


def test_am_loopback():
    audio = tone(700.0, 4000)
    out = run_loopback(AmMod(), AmDemod(), audio)
    snr = tone_snr(out[1500:], 700.0)
    assert snr > 12.0, f"AM audio SNR {snr:.1f} dB"


def test_ssb_usb_loopback():
    audio = tone(1000.0, 4000)
    out = run_loopback(SsbMod(usb=True), SsbDemod(usb=True), audio)
    snr = tone_snr(out[1500:], 1000.0)
    assert snr > 10.0, f"SSB audio SNR {snr:.1f} dB"


def test_ssb_lsb_loopback():
    audio = tone(1000.0, 4000)
    out = run_loopback(SsbMod(usb=False), SsbDemod(usb=False), audio)
    snr = tone_snr(out[1500:], 1000.0)
    assert snr > 10.0, f"SSB-LSB audio SNR {snr:.1f} dB"


def test_ssb_opposite_sideband_rejected():
    audio = tone(1000.0, 4000)
    mod = SsbMod(usb=True)
    _, tx = mod(mod.init_state(), jnp.asarray(audio))
    demod = SsbDemod(usb=False)
    _, out = demod(demod.init_state(), tx["iq"])
    a = np.asarray(out["audio"])[1500:]
    snr = tone_snr(a, 1000.0)
    assert snr < 5.0, f"LSB RX should reject USB signal, SNR {snr:.1f} dB"


def test_wbfm_rx_of_wide_fm():
    """Synthesize a wideband FM signal directly and demodulate."""
    from qradiolink_tpu.ops.analog import FrequencyMod
    from qradiolink_tpu.ops.resample import RationalResampler

    fs = 1_000_000
    n_audio = 4000
    audio = tone(800.0, n_audio)
    up = RationalResampler(125, 1)
    _, audio_up = up(up.init_state(), jnp.asarray(audio))  # 8k -> 1M
    fm = FrequencyMod(2 * np.pi * 75_000.0 / fs)
    _, iq = fm(fm.init_state(), audio_up.real / 125.0 * 125.0)
    demod = WbfmDemod()
    _, out = demod(demod.init_state(), iq)
    a = np.asarray(out["audio"])
    snr = tone_snr(a[1500:], 800.0)
    assert snr > 15.0, f"WBFM audio SNR {snr:.1f} dB"


def test_nbfm_block_streaming_equivalence():
    """Processing IQ in 2 blocks == one block (streaming state correctness)."""
    audio = tone(600.0, 2000)
    mod = NbfmMod()
    _, tx = mod(mod.init_state(), jnp.asarray(audio))
    iq = np.asarray(tx["iq"])
    demod = NbfmDemod()
    _, out_full = demod(demod.init_state(), jnp.asarray(iq))
    st = demod.init_state()
    outs = []
    for half in np.split(iq, 2, axis=-1):
        st, o = demod(st, jnp.asarray(half))
        outs.append(np.asarray(o["audio"]))
    out_chunks = np.concatenate(outs, axis=-1)
    # skip the squelch-opening transient: the binary gate threshold makes
    # the first few ms sensitive to float rounding (same in GNU Radio)
    np.testing.assert_allclose(np.asarray(out_full["audio"])[200:],
                               out_chunks[200:], rtol=1e-3, atol=1e-4)
