"""FreeDV: bridge availability, modem-level loopback, and the full
audio -> SSB chain -> RF -> chain -> audio path (reference
src/gr/gr_demod_freedv.cpp, gr_mod_freedv.cpp)."""

import numpy as np
import pytest

from qradiolink_tpu.audio.freedv import freedv_available

pytestmark = pytest.mark.skipif(not freedv_available(),
                                reason="libcodec2 freedv API missing")


def _utterance(n=8000 * 2, rate=8000):
    """Speech-like test signal: pitch harmonics with formant envelope
    and syllable-rate amplitude modulation."""
    t = np.arange(n) / rate
    f0 = 110.0
    x = sum(np.sin(2 * np.pi * f0 * k * t) / k for k in range(1, 8))
    x *= 0.5 + 0.5 * np.sin(2 * np.pi * 3.0 * t) ** 2
    return (x / np.abs(x).max() * 12000).astype(np.int16)


def test_modem_loopback_1600():
    from qradiolink_tpu.audio.freedv import FreeDV
    fd_tx, fd_rx = FreeDV("1600"), FreeDV("1600")
    speech = _utterance()
    modem = fd_tx.tx(speech)
    assert modem.size > 0
    out = fd_rx.rx(modem)
    assert fd_rx.sync
    assert out.size >= speech.size * 0.7
    # decoded speech has real energy (codec2 is lossy: compare power)
    assert np.mean(out.astype(np.float64) ** 2) > 1e4
    fd_tx.close(), fd_rx.close()


def test_modem_loopback_700c():
    from qradiolink_tpu.audio.freedv import FreeDV
    fd_tx, fd_rx = FreeDV("700C"), FreeDV("700C")
    speech = _utterance()
    out = fd_rx.rx(fd_tx.tx(speech))
    assert fd_rx.sync
    assert out.size > 0
    fd_tx.close(), fd_rx.close()


@pytest.mark.parametrize("usb", [True, False])
def test_freedv_rf_loopback_1600(usb):
    """Full path: utterance -> FreeDvTx (vocoder + USB/LSB chain) ->
    AWGN channel -> FreeDvRx -> decoded speech with modem sync."""
    from qradiolink_tpu.chains.freedv import FreeDvTx, FreeDvRx
    from qradiolink_tpu.chains.channel import ChannelModel
    import jax.numpy as jnp

    tx = FreeDvTx("1600", usb=usb)
    rx = FreeDvRx("1600", usb=usb)
    speech = _utterance(8000 * 3).astype(np.float32) / 32768.0
    iq = tx.process(speech)
    assert iq.size > 0
    iq = np.asarray(ChannelModel(1_000_000, snr_db=20.0, seed=2)(
        jnp.asarray(iq)))
    m = iq.size - iq.size % 125
    out = rx.process(iq[:m])
    assert rx.sync, "FreeDV modem did not sync over the RF loopback"
    assert out.size > speech.size * 0.5
    assert np.mean(out ** 2) > 1e-4


def test_registry_has_all_freedv_variants():
    from qradiolink_tpu.models.registry import MODES
    for m in ("1600", "700C", "700D", "800XA"):
        for sb in ("USB", "LSB"):
            assert f"FreeDV{m}{sb}" in MODES


def test_modem_loopback_2400a():
    """FreeDV 2400A (the r5 registry addition): vocoder+modem loopback
    through libcodec2 (reference ModemTypeFREEDV2400AUSB/LSB)."""
    from qradiolink_tpu.audio.freedv import FreeDV
    fd_tx, fd_rx = FreeDV("2400A"), FreeDV("2400A")
    speech = _utterance()
    out = fd_rx.rx(fd_tx.tx(speech))
    assert fd_rx.sync
    assert out.size > 0
    fd_tx.close(), fd_rx.close()


@pytest.mark.parametrize("usb", [True, False])
def test_freedv_2400a_rf_loopback(usb):
    """Full path for the 2400A registry entries: utterance -> FreeDvTx
    (2400A vocoder + wideband SSB chain) -> clean channel -> FreeDvRx."""
    from qradiolink_tpu.chains.freedv import FreeDvTx, FreeDvRx
    import numpy as np

    tx = FreeDvTx("2400A", usb=usb, filter_width=4000.0)
    rx = FreeDvRx("2400A", usb=usb, filter_width=4000.0)
    speech = _utterance(8000 * 3).astype(np.float32) / 32768.0
    iq = tx.process(speech)
    assert iq.size > 0
    out = rx.process(np.asarray(iq))
    assert out.size > 0
    assert np.mean(out.astype(np.float64) ** 2) > 1e-4
