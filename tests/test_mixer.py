"""Audio mixer + UDP PCM client (reference src/audio/audiomixer.cpp,
src/udpclient.cpp)."""

import numpy as np

from qradiolink_tpu.audio.mixer import AudioMixer, UdpAudioClient, MIX_FRAME


def test_mixer_sums_sources_and_drains():
    m = AudioMixer()
    a = np.full(400, 1000, np.int16)
    b = np.full(320, -500, np.int16)
    m.add_samples(a, sid=1)
    m.add_samples(b, sid=2)
    assert m.buffers_available(MIX_FRAME)
    mix = m.mix_samples(rx_volume=1.0)
    assert mix is not None and mix.shape == (320,)
    # two channels: each scaled by 1/2 -> 500 - 250 = 250
    assert np.all(mix[:320] == 250)
    # queue drained: sid 1 has 80 left, sid 2 gone
    mix2 = m.mix_samples(rx_volume=1.0, maximum_frame_size=40)
    assert mix2 is not None
    assert np.all(mix2[:80] == 1000)  # single channel now, full volume
    assert np.all(mix2[80:] == 0)
    assert m.mix_samples() is None


def test_mixer_radio_sid_bypasses_volume():
    m = AudioMixer()
    m.add_samples(np.full(320, 1000, np.int16), sid=9901)
    mix = m.mix_samples(rx_volume=0.0)
    assert np.all(mix == 1000)


def test_udp_audio_roundtrip_48k():
    rx = UdpAudioClient(listen_port=0, send_port=0, wire_rate=48_000)
    tx = UdpAudioClient(listen_port=0, send_port=rx.port,
                        wire_rate=48_000)
    t = np.arange(8000) / 8000.0
    pcm = (8000 * np.sin(2 * np.pi * 400 * t)).astype(np.int16)
    tx.write_audio(pcm)
    import time
    got = np.zeros(0, np.int16)
    for _ in range(50):
        time.sleep(0.01)
        got = np.concatenate([got, rx.read_audio()])
        if got.size >= 6000:
            break
    assert got.size >= 6000, f"only {got.size} samples received"
    # 400 Hz tone survives the 8k -> 48k -> 8k double resampling
    x = got[1000:6000].astype(np.float64)
    sp = np.abs(np.fft.rfft(x * np.hanning(len(x)))) ** 2
    f = np.fft.rfftfreq(len(x), 1 / 8000)
    peak = f[np.argmax(sp[1:]) + 1]
    assert abs(peak - 400.0) < 20.0, f"peak at {peak} Hz"
    rx.close(), tx.close()
