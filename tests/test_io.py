"""io layer tests: IQ formats/files/UDP, WAV, MMDVM wire format, TDMA
slot clock, config persistence."""

import threading

import numpy as np
import pytest

from qradiolink_tpu.io.iq import (
    read_iq, write_iq, IqFileSource, UdpIqSource, UdpIqSink, SignalSource)
from qradiolink_tpu.io.wav import read_wav, write_wav
from qradiolink_tpu.io import mmdvm_transport as mt
from qradiolink_tpu.framing import tdma
from qradiolink_tpu.config import Settings, RadioChannels, MemoryChannel


@pytest.mark.parametrize("fmt,tol", [("cf32", 1e-7), ("cs16", 1e-4),
                                     ("cu8", 1e-2)])
def test_iq_file_roundtrip(fmt, tol, tmp_path):
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(1000) + 1j * rng.standard_normal(1000)) \
        .astype(np.complex64) * 0.2
    x = np.clip(x.real, -0.99, 0.99) + 1j * np.clip(x.imag, -0.99, 0.99)
    p = tmp_path / f"sig.{fmt}"
    write_iq(p, x, fmt)
    y = read_iq(p, fmt)
    np.testing.assert_allclose(y, x, atol=tol)


def test_iq_file_source_blocks(tmp_path):
    x = np.arange(1050, dtype=np.complex64)
    p = tmp_path / "sig.cf32"
    write_iq(p, x)
    blocks = list(IqFileSource(p, 500))
    assert len(blocks) == 3
    np.testing.assert_array_equal(blocks[0], x[:500])
    # last block zero-padded
    assert np.all(blocks[2][50:] == 0)
    np.testing.assert_array_equal(blocks[2][:50], x[1000:])


def test_udp_iq_roundtrip():
    src = UdpIqSource(port=0, block_len=600, timeout=5.0)
    port = src.sock.getsockname()[1]
    sink = UdpIqSink(port=port)
    x = (np.arange(600) * (1 + 1j)).astype(np.complex64) / 600.0
    t = threading.Thread(target=sink.write, args=(x,))
    t.start()
    blk = src.read_block()
    t.join()
    np.testing.assert_allclose(blk, x, atol=1e-6)
    src.close()
    sink.close()


def test_wav_roundtrip(tmp_path):
    x = np.sin(2 * np.pi * 440 * np.arange(8000) / 8000).astype(np.float32)
    p = tmp_path / "a.wav"
    write_wav(p, x, 8000)
    y, rate = read_wav(p)
    assert rate == 8000
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_signal_source_tone():
    src = SignalSource(4096, 48000.0, tone_hz=1000.0, amplitude=1.0)
    b1 = next(iter(src))
    spec = np.abs(np.fft.fft(b1))
    f = np.fft.fftfreq(4096, 1 / 48000)
    assert abs(f[np.argmax(spec)] - 1000.0) < 24.0


def test_mmdvm_wire_format_roundtrip():
    samples = (np.arange(720) - 360).astype(np.int16)
    control = np.zeros(720, np.uint8)
    control[0] = mt.MARK_SLOT1
    msg = mt.pack_rx_message(samples, control, rssi=42)
    s2, c2, rssi = mt.unpack_rx_message(msg)
    np.testing.assert_array_equal(s2, samples)
    np.testing.assert_array_equal(c2, control)
    assert rssi == 42
    # exact reference layout: u32 count, u32 rssi, ctrl bytes, shorts
    assert len(msg) == 8 + 720 + 1440
    tmsg = mt.pack_tx_message(samples, control)
    s3, c3 = mt.unpack_tx_message(tmsg)
    np.testing.assert_array_equal(s3, samples)
    np.testing.assert_array_equal(c3, control)


@pytest.mark.skipif(not mt.zmq_available(), reason="pyzmq missing")
def test_mmdvm_zmq_push(tmp_path):
    import zmq
    path = f"ipc://{tmp_path}/rx1.ipc"
    pub = mt.MmdvmRxPublisher(1, path_tpl=path.replace("rx1", "rx{}"))
    ctx = zmq.Context.instance()
    pull = ctx.socket(zmq.PULL)
    pull.setsockopt(zmq.RCVTIMEO, 3000)
    pull.connect(path)
    import time
    time.sleep(0.3)  # let the PULL peer join before the DONTWAIT push
    samples = np.ones(1440, np.int16)
    pub.push_samples(0, samples)
    m1 = pull.recv()
    s, c, rssi = mt.unpack_rx_message(m1)
    assert s.size == 720 and np.all(s == 1)
    pull.close(0)
    pub.close()


def test_burst_timer_slot_allocation():
    bt = tdma.BurstTimer(num_channels=1)
    bt.set_timer(0)
    bt.increment(0, 720)          # 30 ms elapsed
    t1 = bt.allocate_slot(1)
    t2 = bt.allocate_slot(2)
    assert t2 - t1 == tdma.SLOT_TIME_NS
    assert t1 >= bt.time_delta(0)  # burst delay pushes TX into the future


def test_burst_timer_tx_mask():
    bt = tdma.BurstTimer(num_channels=1)
    bt.set_timer(0)
    t1 = bt.allocate_slot(1)
    n = 24_000  # 1 s at 24k
    mask = bt.tx_mask(n)
    on = np.nonzero(mask)[0]
    assert on.size == tdma.SAMPLES_PER_SLOT
    # slot starts at its allocated time
    start_ns = (on[0] + 1) * tdma.TIME_PER_SAMPLE_NS
    assert abs(start_ns - t1) <= tdma.TIME_PER_SAMPLE_NS


def test_slot_mask_alternation():
    m1 = tdma.slot_mask(2880, active_slot=1)
    m2 = tdma.slot_mask(2880, active_slot=2)
    np.testing.assert_array_equal(m1 + m2, np.ones(2880, np.float32))
    assert m1[:720].all() and not m1[720:1440].any()


def test_settings_roundtrip(tmp_path):
    s = Settings(rx_mode="4FSK2K", squelch_db=-70.0, callsign="TPU1")
    p = s.save(tmp_path / "cfg.json")
    s2 = Settings.load(p)
    assert s2 == s


def test_memory_channels_roundtrip(tmp_path):
    chans = RadioChannels([
        MemoryChannel("repeater", 434_650_000, -7_600_000, "NBFM", "NBFM"),
        MemoryChannel("digital", 433_500_000, 0, "4FSK2K", "4FSK2K")])
    p = chans.save(tmp_path / "mem.json")
    c2 = RadioChannels.load(p)
    assert len(c2.channels) == 2
    assert c2.channels[1].rx_mode == "4FSK2K"


def test_mmdvm_tx_poller_against_fake_mmdvmhost(tmp_path):
    """REQ/REP poll path (reference gr_mmdvm_source.cpp:117-130): a fake
    MMDVMHost REP socket serves one burst then idle replies."""
    import threading
    import numpy as np
    import zmq
    from qradiolink_tpu.io.mmdvm_transport import (
        MmdvmTxPoller, pack_tx_message, unpack_tx_message, MARK_SLOT1)

    path = f"ipc://{tmp_path}/mmdvm-tx1.ipc"
    ctx = zmq.Context.instance()
    rep = ctx.socket(zmq.REP)
    rep.bind(path)
    burst = (np.arange(720) % 100).astype(np.int16)
    ctrl = np.full(720, MARK_SLOT1, np.uint8)

    def serve():
        # first poll -> a real burst; second -> idle (empty) reply
        rep.recv()
        rep.send(pack_tx_message(burst, ctrl))
        rep.recv()
        rep.send(pack_tx_message(np.zeros(0, np.int16),
                                 np.zeros(0, np.uint8)))

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    poller = MmdvmTxPoller(1, path_tpl=path.replace("tx1", "tx{}")
                           if "tx1" in path else path, timeout_ms=2000)
    got = poller.poll(0)
    assert got is not None
    samples, control = got
    np.testing.assert_array_equal(samples, burst)
    np.testing.assert_array_equal(control, ctrl)
    # idle reply -> zero-length burst (the radio then fills with zeros,
    # gr_mmdvm_source idle-fill semantics)
    got2 = poller.poll(0)
    assert got2 is not None and got2[0].size == 0
    t.join(timeout=2)
    poller.close()
    rep.close(0)


def test_mmdvm_per_slot_rssi():
    """Chains report one RSSI value per 720-sample slot and the
    publisher tags each slot message with its own value."""
    import numpy as np
    import jax.numpy as jnp
    from qradiolink_tpu.chains.mmdvm import MmdvmDemod

    dem = MmdvmDemod()
    n = 250_000  # -> 24000 samples @24k = 33 slots
    rng = np.random.default_rng(0)
    # amplitude step halfway: per-slot RSSI must show the step
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)) * 0.01
    iq[n // 2:] *= 20.0
    _, out = dem(dem.init_state(), jnp.asarray(iq.astype(np.complex64)))
    slots = np.asarray(out["rssi_slots"])
    assert slots.ndim == 1 and slots.size >= 30
    assert slots[-2] - slots[2] > 20.0, "per-slot RSSI missed the step"


def test_audio_recorder(tmp_path):
    import numpy as np
    from qradiolink_tpu.audio.recorder import AudioRecorder
    from qradiolink_tpu.audio.flac import read_flac
    from qradiolink_tpu.io.wav import read_wav
    # default format is FLAC, matching the reference's libsndfile FLAC
    # recording (audiorecorder.cpp:24,39)
    rec = AudioRecorder(tmp_path)
    assert not rec.recording
    p = rec.start("testrec")
    assert p.suffix == ".flac"
    t = np.arange(8000) / 8000.0
    tone = (0.5 * np.sin(2 * np.pi * 500 * t)).astype(np.float32)
    rec.write(tone)
    rec.write(tone)
    out = rec.stop()
    assert out == p and not rec.recording
    samples, rate = read_flac(out)
    assert rate == 8000 and samples.size == 16000
    assert abs(np.abs(samples).max() / 32767.0 - 0.5) < 0.01
    # WAV format still available
    rec = AudioRecorder(tmp_path, fmt="wav")
    rec.start("testrec2")
    rec.write(tone)
    samples, rate = read_wav(rec.stop())
    assert rate == 8000 and samples.size == 8000


def test_zmq_udp_proxy(tmp_path):
    """UDP audio in -> MMDVM slot messages out; MMDVMHost TX reply ->
    UDP out (reference zeromqclient.cpp pthread loops, poll-driven)."""
    import threading
    import numpy as np
    import zmq
    from qradiolink_tpu.io.zmq_proxy import ZmqUdpProxy
    from qradiolink_tpu.io.mmdvm_transport import (
        unpack_rx_message, pack_tx_message)

    rx_path = f"ipc://{tmp_path}/prx.ipc"
    tx_path = f"ipc://{tmp_path}/ptx.ipc"
    ctx = zmq.Context.instance()
    # fake MMDVMHost: PULL baseband, REP serves one TX burst
    pull = ctx.socket(zmq.PULL)
    pull.setsockopt(zmq.RCVTIMEO, 2000)
    rep = ctx.socket(zmq.REP)
    rep.bind(tx_path)
    burst = (np.arange(720) % 50).astype(np.int16)

    def serve():
        rep.recv()
        rep.send(pack_tx_message(burst, np.zeros(720, np.uint8)))

    t = threading.Thread(target=serve, daemon=True)
    t.start()
    proxy = ZmqUdpProxy(udp_listen_port=0, udp_send_port=0,
                        rx_path=rx_path, tx_path=tx_path)
    pull.connect(rx_path)
    # point the proxy's UDP TX at our own socket
    import socket as _s
    udp_rx = _s.socket(_s.AF_INET, _s.SOCK_DGRAM)
    udp_rx.bind(("127.0.0.1", 0))
    udp_rx.settimeout(2.0)
    proxy.udp_addr = ("127.0.0.1", udp_rx.getsockname()[1])
    # send 720 samples of UDP audio to the proxy
    pcm = (np.arange(720) % 99).astype(np.int16)
    tx_sock = _s.socket(_s.AF_INET, _s.SOCK_DGRAM)
    tx_sock.sendto(pcm.tobytes(), proxy.udp.getsockname())
    import time as _t
    _t.sleep(0.05)
    pushed, sent = proxy.pump()
    assert pushed == 1
    samples, ctrl, rssi = unpack_rx_message(pull.recv())
    np.testing.assert_array_equal(samples, pcm)
    # the REQ poll got the fake MMDVMHost burst -> UDP out
    data, _ = udp_rx.recvfrom(65536)
    np.testing.assert_array_equal(np.frombuffer(data, np.int16), burst)
    proxy.close(); pull.close(0); rep.close(0)
    udp_rx.close(); tx_sock.close()
    t.join(timeout=2)


def test_mmdvm_full_transport_loop(tmp_path):
    """The complete MMDVM integration: RF -> MmdvmDemod -> RxPublisher
    -> (fake MMDVMHost echoes baseband) -> TxPoller -> MmdvmMod -> RF,
    with the echoed audio surviving both FM hops."""
    import threading
    import numpy as np
    import jax.numpy as jnp
    import zmq
    from qradiolink_tpu.chains.mmdvm import MmdvmDemod, MmdvmMod, TARGET_RATE
    from qradiolink_tpu.io.mmdvm_transport import (
        MmdvmRxPublisher, MmdvmTxPoller, pack_tx_message,
        unpack_rx_message, SAMPLES_PER_SLOT)

    rx_path = f"ipc://{tmp_path}/rx1.ipc"
    tx_path = f"ipc://{tmp_path}/tx1.ipc"
    ctx = zmq.Context.instance()
    pull = ctx.socket(zmq.PULL)
    pull.setsockopt(zmq.RCVTIMEO, 3000)
    rep = ctx.socket(zmq.REP)
    rep.bind(tx_path)
    echoed = []

    def mmdvmhost():
        # pull RX slots, echo the first 4 back on the TX REQ/REP side
        slots = []
        for _ in range(4):
            samples, ctrl, rssi = unpack_rx_message(pull.recv())
            slots.append(samples)
        echoed.extend(slots)
        served = 0
        while served < len(slots):
            rep.recv()
            rep.send(pack_tx_message(slots[served],
                                     np.zeros(SAMPLES_PER_SLOT, np.uint8)))
            served += 1

    # RF in: a 1 kHz tone on the MMDVM carrier
    n24 = SAMPLES_PER_SLOT * 8
    t = np.arange(n24 * 125 // 12) / 250_000
    iq_in = (0.12 * np.exp(2j * np.pi * 0.0 * t)).astype(np.complex64)
    audio_t = np.arange(n24) / TARGET_RATE
    mod0 = MmdvmMod()
    _, m0 = mod0(mod0.init_state(), jnp.asarray(
        (0.15 * np.sin(2 * np.pi * 1000.0 * audio_t)).astype(np.float32)))
    iq_in = np.asarray(m0["iq"])

    dem = MmdvmDemod()
    m = len(iq_in) - len(iq_in) % 125
    _, out = dem(dem.init_state(), jnp.asarray(iq_in[:m]))
    audio = np.asarray(out["audio"])
    rssi_slots = np.asarray(out["rssi_slots"])

    pub = MmdvmRxPublisher(1, path_tpl=rx_path.replace("rx1", "rx{}"))
    pull.connect(rx_path)
    th = threading.Thread(target=mmdvmhost, daemon=True)
    th.start()
    pub.push_samples(0, audio, rssi=-(rssi_slots.astype(int)))

    poller = MmdvmTxPoller(1, path_tpl=tx_path.replace("tx1", "tx{}"),
                           timeout_ms=3000)
    tx_samples = []
    for _ in range(4):
        got = poller.poll(0)
        assert got is not None
        tx_samples.append(got[0])
    th.join(timeout=5)
    baseband = np.concatenate(tx_samples).astype(np.float32) / 32767.0
    mod = MmdvmMod()
    _, txo = mod(mod.init_state(), jnp.asarray(baseband))
    iq_out = np.asarray(txo["iq"])
    # the echoed tone survives the full loop: demod the re-modulated RF
    dem2 = MmdvmDemod()
    m2 = len(iq_out) - len(iq_out) % 125
    _, out2 = dem2(dem2.init_state(), jnp.asarray(iq_out[:m2]))
    rec = np.asarray(out2["audio"])[1000:]
    x = rec - rec.mean()
    sp = np.abs(np.fft.rfft(x * np.hanning(x.size))) ** 2
    f = np.fft.rfftfreq(x.size, 1 / TARGET_RATE)
    sig = sp[np.abs(f - 1000.0) < 150].sum()
    noise = sp[(np.abs(f - 1000.0) >= 150) & (f > 50) & (f < 4000)].sum()
    snr = 10 * np.log10(sig / (noise + 1e-12))
    assert snr > 20.0, f"full-loop tone SNR {snr:.1f} dB"
    pub.close(); poller.close(); pull.close(0); rep.close(0)


def test_cli_mmdvm_proxy_subcommand(tmp_path, monkeypatch):
    """The reference --mmdvm --udp service mode is CLI-reachable."""
    pytest.importorskip("zmq")
    from qradiolink_tpu.app.cli import main as cli_main
    # run a few pump ticks against nothing (sockets bind/connect, no
    # traffic) — exercises wiring + clean shutdown
    monkeypatch.setattr("qradiolink_tpu.io.zmq_proxy.ZmqUdpProxy.__init__",
                        lambda self, **kw: setattr(self, "_n", 0) or None)
    monkeypatch.setattr("qradiolink_tpu.io.zmq_proxy.ZmqUdpProxy.pump",
                        lambda self: (0, 0))
    monkeypatch.setattr("qradiolink_tpu.io.zmq_proxy.ZmqUdpProxy.close",
                        lambda self: None)
    rc = cli_main(["mmdvm-proxy", "--ticks", "3"])
    assert rc == 0
