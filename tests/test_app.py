"""App-layer tests: RadioController RX/TX orchestration, watchdogs, CLI
rx/tx file paths — the reference's RadioController behaviors
(radiocontroller.cpp:246-366) exercised offline."""

import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.config import Settings, RadioChannels, MemoryChannel
from qradiolink_tpu.app.controller import RadioController
from qradiolink_tpu.app.cli import main as cli_main
from qradiolink_tpu.framing.layer1 import FrameType
from qradiolink_tpu.io.iq import write_iq
from qradiolink_tpu.io.wav import read_wav


def _text_transmission(ctl, text, preamble=30, flush=50_000):
    pre = ctl._framer.frame(b"\xaa" * 64, FrameType.VOICE_2) * preamble
    return np.concatenate([
        ctl.tx_bytes(pre), ctl.tx_text(text),
        np.zeros(flush, np.complex64)])


def test_controller_text_roundtrip():
    s = Settings()
    s.rx_mode = s.tx_mode = "4FSK2K"
    tx = RadioController(s)
    tx.toggle_tx_mode("4FSK2K")
    tx.start_transmission()
    iq = _text_transmission(tx, "hello tpu radio")
    rx = RadioController(s)
    rx.toggle_rx_mode("4FSK2K")
    block = 125_000
    iq = np.concatenate([iq, np.zeros((-len(iq)) % block, np.complex64)])
    got, ended = [], False
    for ev in rx.run_rx(iq.reshape(-1, block)):
        if ev.kind == "text":
            got.append(ev.text)
        if ev.kind == "receive_end":
            ended = True
    assert "hello tpu radio" in "".join(got)
    assert ended


def test_controller_rx_watchdog():
    """No decoded data for rx_timeout_ms after a reception starts ->
    receive_end fires (radiocontroller.cpp:336-340)."""
    s = Settings()
    s.rx_mode = s.tx_mode = "4FSK2K"
    s.rx_timeout_ms = 200
    tx = RadioController(s)
    tx.toggle_tx_mode("4FSK2K")
    tx.start_transmission()
    pre = tx._framer.frame(b"\xaa" * 64, FrameType.VOICE_2) * 30
    # voice frames then silence — no END frame is ever sent
    iq = np.concatenate([tx.tx_bytes(pre),
                         np.zeros(600_000, np.complex64)])
    rx = RadioController(s)
    rx.toggle_rx_mode("4FSK2K")
    block = 125_000
    iq = np.concatenate([iq, np.zeros((-len(iq)) % block, np.complex64)])
    kinds = [ev.kind for ev in rx.run_rx(iq.reshape(-1, block))]
    assert "receive_end" in kinds           # watchdog fired without END


def test_controller_tot_timer():
    s = Settings()
    s.tx_mode = "FM"
    s.tot_seconds = 0.5
    ctl = RadioController(s)
    ctl.toggle_tx_mode("FM")
    ctl.start_transmission()
    pcm = np.zeros(8000, np.float32)
    for _ in range(2):
        out = ctl.tx_audio_block(pcm)
    assert not ctl.transmitting              # TOT ended the transmission


def test_controller_vox_gate():
    s = Settings()
    s.tx_mode = "FM"
    s.vox_level = 0.1
    ctl = RadioController(s)
    ctl.toggle_tx_mode("FM")
    ctl.start_transmission()
    silent = np.zeros(8000, np.float32)
    assert ctl.tx_audio_block(silent) is None
    loud = 0.5 * np.sin(2 * np.pi * 800 * np.arange(8000) / 8000
                        ).astype(np.float32)
    assert ctl.tx_audio_block(loud) is not None


def test_cli_tx_rx_nbfm_to_wav(tmp_path):
    """CLI demodulates a recorded NBFM IQ file to WAV (VERDICT item 5
    acceptance)."""
    iq_path = tmp_path / "fm.cf32"
    wav_path = tmp_path / "out.wav"
    # TX an 800 Hz tone via the CLI tx path would need a wav; make one
    t = np.arange(24_000) / 8000.0
    tone = (0.5 * np.sin(2 * np.pi * 800 * t)).astype(np.float32)
    from qradiolink_tpu.io.wav import write_wav
    write_wav(tmp_path / "in.wav", tone, 8000)
    rc = cli_main(["tx", "--mode", "FM", "--wav-in", str(tmp_path / "in.wav"),
                   "--iq-out", str(iq_path)])
    assert rc == 0
    rc = cli_main(["rx", "--mode", "FM", "--iq-in", str(iq_path),
                   "--wav-out", str(wav_path)])
    assert rc == 0
    audio, rate = read_wav(wav_path)
    assert rate == 8000 and audio.size > 8000
    # the tone survives the TX->RX cycle
    x = audio[4000:]
    spec = np.abs(np.fft.rfft(x * np.hanning(len(x))))
    f = np.fft.rfftfreq(len(x), 1 / 8000)
    band = (f > 200) & (f < 3000)
    assert abs(f[band][np.argmax(spec[band])] - 800.0) < 40.0


def test_scan_memory_channels():
    s = Settings()
    ctl = RadioController(s)
    chans = RadioChannels([
        MemoryChannel("quiet", 433_000_000, 0, "FM", "FM", squelch_db=-60.0),
        MemoryChannel("active", 434_000_000, 0, "FM", "FM", squelch_db=-60.0)])

    def iq_source(ch):
        rng = np.random.default_rng(1)
        n = 125_000
        if ch.name == "active":   # strong carrier
            t = np.arange(n) / 1e6
            yield (0.7 * np.exp(2j * np.pi * 1000 * t)).astype(np.complex64)
        else:                      # noise floor
            yield (1e-4 * (rng.standard_normal(n) + 1j *
                           rng.standard_normal(n))).astype(np.complex64)

    hit = ctl.scan_memory_channels(chans, iq_source, blocks_per_channel=1)
    assert hit is not None and hit.name == "active"


def test_wideband_digital_voice_uses_opus():
    """QPSK20K voice must dispatch Opus (47-byte CBR packets, one per
    layer-1 frame), not Codec2 (reference radiocontroller.cpp:667,
    :1462)."""
    import pytest
    from qradiolink_tpu.audio.codecs import opus_available, codec2_available
    if not (opus_available() and codec2_available()):
        pytest.skip("codec libraries missing")
    import jax.numpy as jnp
    from qradiolink_tpu.chains.channel import ChannelModel

    s = Settings()
    s.rx_mode = s.tx_mode = "QPSK20K"
    ctl = RadioController(s)
    assert ctl._voice_codec("QPSK20K") == ("opus",)
    assert ctl._voice_codec("4FSK2K") == ("codec2", 1400)
    assert ctl._voice_codec("BPSK1K") == ("codec2", 700)
    assert ctl._voice_codec("M17") == ("codec2", 3200)

    ctl.start_transmission()
    t = np.arange(8000) / 8000.0
    pcm = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    pre = ctl.tx_bytes(b"\xaa" * 1500)
    iq = ctl.tx_audio_block(pcm)
    post = ctl.tx_bytes(b"\xaa" * 1500)
    assert iq is not None
    full = np.concatenate([pre, iq, post])
    full = np.asarray(ChannelModel(1_000_000, snr_db=25.0, seed=6)(
        jnp.asarray(full)))

    rx = RadioController(s)
    rx.toggle_rx_mode("QPSK20K")
    events = []
    blk = 50_000
    m = len(full) - len(full) % blk
    for i in range(0, m, blk):
        events.extend(rx.rx_block(jnp.asarray(full[i:i + blk])))
    audio = np.concatenate([e.audio for e in events if e.kind == "audio"
                            and e.audio.size]) \
        if any(e.kind == "audio" for e in events) else np.zeros(0)
    assert audio.size > 4000, "no Opus audio decoded over the loopback"
    # the 440 Hz tone must dominate the decoded audio spectrum
    sp = np.abs(np.fft.rfft(audio * np.hanning(audio.size))) ** 2
    f = np.fft.rfftfreq(audio.size, 1 / 8000.0)
    peak = f[np.argmax(sp[1:]) + 1]
    assert abs(peak - 440.0) < 30.0, f"peak at {peak} Hz"


def test_frequency_scan_steps_and_pauses():
    from qradiolink_tpu.app.controller import FrequencyScanner
    s = Settings()
    s.rx_sample_rate = 1_000_000
    s.scan_resume_ms = 5000
    ctl = RadioController(s)
    sc = FrequencyScanner(ctl, step_hz=100_000)
    t = 0.0
    for i in range(4):
        sc.tick(receiving=False, now_s=t)
        t += 0.2
    assert s.demod_offset == 400_000
    # crossing the upper edge wraps and bumps the main carrier
    f0 = s.rx_frequency
    sc.tick(receiving=False, now_s=t); t += 0.2
    assert s.rx_frequency == f0 + 1_000_000
    assert s.demod_offset == -500_000 + 0
    # a signal pauses the scan for scan_resume_ms
    off = s.demod_offset
    sc.tick(receiving=True, now_s=t)
    sc.tick(receiving=False, now_s=t + 1.0)
    assert s.demod_offset == off
    sc.tick(receiving=False, now_s=t + 5.2)
    assert s.demod_offset != off
    sc.stop()
    assert not sc.active


def test_repeater_forwards_text():
    from qradiolink_tpu.app.controller import (
        RepeaterForwarder, RxEvent)
    s = Settings()
    s.rx_mode = s.tx_mode = "4FSK2K"
    s.repeater_enabled = True
    ctl = RadioController(s)
    fwd = RepeaterForwarder(ctl)
    out = fwd.forward([RxEvent("text", text="CQ CQ")])
    assert len(out) == 1 and out[0].size > 0
    s.repeater_enabled = False
    assert fwd.forward([RxEvent("text", text="CQ")]) == []


def test_beacon_frame_roundtrip():
    from qradiolink_tpu.app.controller import beacon_frame
    from qradiolink_tpu.framing.layer2 import (
        parse_layer2_frame, MSG_REPEATER_INFO)
    import struct
    s = Settings()
    s.callsign = "N0REP"
    s.rx_frequency = 439_000_000
    s.tx_shift = -7_600_000
    ctl = RadioController(s)
    frame = beacon_frame(ctl)
    msg_type, payload = parse_layer2_frame(frame)
    assert msg_type == MSG_REPEATER_INFO
    rx_f, tx_f, n = struct.unpack(">qqB", payload[:17])
    assert rx_f == 439_000_000 and tx_f == 431_400_000
    assert payload[17:17 + n] == b"N0REP"


def test_headless_service_via_telnet(tmp_path):
    """The headless subcommand: boots, accepts telnet, obeys shutdown
    (reference main.cpp headless mode)."""
    import socket
    import threading
    from qradiolink_tpu.app.cli import main as cli_main

    rc = {}

    def run():
        rc["v"] = cli_main(["headless", "--control-port", "0",
                            "--rx-mode", "NBFM"])

    # control-port 0 -> ephemeral; find it via the controller? The
    # TelnetServer logs the port; simplest: patch via direct run with a
    # fixed free port
    s = socket.socket(); s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]; s.close()
    t = threading.Thread(
        target=lambda: rc.update(v=cli_main(
            ["headless", "--control-port", str(port)])), daemon=True)
    t.start()
    import time
    deadline = time.time() + 10
    c = None
    while time.time() < deadline:
        try:
            c = socket.create_connection(("127.0.0.1", port), timeout=1)
            break
        except OSError:
            time.sleep(0.1)
    assert c is not None, "headless service never opened telnet"
    f = c.makefile("rwb")
    f.readline(); f.readline()      # banner
    f.write(b"rxmode\n"); f.flush()
    assert b"NBFM" in f.readline()
    f.write(b"shutdown\n"); f.flush()
    f.readline()
    c.close()
    t.join(timeout=10)
    assert rc.get("v") == 0


def test_init_error_recovery():
    """Bad mode: clean deinit + init_error recorded (reference
    radiocontroller.cpp:1968-1983 initError path)."""
    import pytest
    ctl = RadioController(Settings())
    with pytest.raises(Exception):
        ctl.toggle_rx_mode("NOSUCHMODE")
    assert ctl._rx is None and ctl.init_error
    # recovery: a good mode clears the error
    ctl.toggle_rx_mode("NBFM")
    assert ctl._rx is not None and not ctl.init_error


def test_profiling_helpers():
    import jax.numpy as jnp
    import jax
    from qradiolink_tpu.utils.profiling import step_timer, annotate
    f = jax.jit(lambda x: x * 2.0)
    x = jnp.ones(1000)
    stats = step_timer(f, x, iters=2, samples_per_step=1000)
    assert stats["step_ms"] > 0 and stats["samples_per_s"] > 0
    with annotate("test-region"):
        f(x)


def test_controller_m17_rx_dispatch():
    """M17 through the controller: audio events + source callsign
    (reference radiocontroller M17 decode path)."""
    import pytest
    from qradiolink_tpu.audio.codecs import codec2_available
    if not codec2_available():
        pytest.skip("codec2 missing")
    import jax.numpy as jnp
    from qradiolink_tpu.protocols.m17 import LinkSetupFrame, FrameEncoder
    from qradiolink_tpu.chains.m17 import M17Mod

    lsf = LinkSetupFrame.for_stream("SP5WWP", "AB1CDE")
    enc = FrameEncoder(lsf)
    frames = [enc.encode_preamble(), enc.encode_lsf()]
    payload = bytes(range(16))
    for i in range(8):
        frames.append(enc.encode_stream(payload, last=(i == 7)))
    bits = np.concatenate(frames + [np.zeros(2000, np.uint8)])
    bits = np.concatenate([bits, np.zeros((-len(bits)) % 48, np.uint8)])
    m = M17Mod()
    _, tx = m(m.init_state(), jnp.asarray(bits))
    iq = np.asarray(tx["iq"])

    s = Settings()
    s.rx_mode = "M17"
    ctl = RadioController(s)
    ctl.toggle_rx_mode("M17")
    blk = 50_000
    n = len(iq) - len(iq) % blk
    events = []
    for i in range(0, n, blk):
        events.extend(ctl.rx_block(iq[i:i + blk]))
    kinds = [e.kind for e in events]
    assert "audio" in kinds, kinds
    cs = [e.text for e in events if e.kind == "callsign"]
    assert "SP5WWP" in cs


def test_controller_freedv_rx_dispatch():
    """FreeDV through the controller: full audio out of rx_block."""
    import pytest
    from qradiolink_tpu.audio.freedv import freedv_available
    if not freedv_available():
        pytest.skip("freedv missing")
    from qradiolink_tpu.chains.freedv import FreeDvTx

    tx = FreeDvTx("1600", usb=True)
    t = np.arange(8000 * 2) / 8000.0
    speech = (0.4 * np.sin(2 * np.pi * 300 * t)
              * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t) ** 2)
              ).astype(np.float32)
    iq = tx.process(speech)
    s = Settings()
    s.rx_mode = "FreeDV1600USB"
    ctl = RadioController(s)
    ctl.toggle_rx_mode("FreeDV1600USB")
    blk = 125_000
    n = len(iq) - len(iq) % blk
    audio = []
    for i in range(0, n, blk):
        for ev in ctl.rx_block(iq[i:i + blk]):
            if ev.kind == "audio":
                audio.append(ev.audio)
    got = np.concatenate(audio) if audio else np.zeros(0)
    assert got.size > 4000, "no FreeDV audio decoded via controller"


def test_controller_dmr_rx_and_tx():
    """DMR through the controller: BS voice stream -> audio/callsign/
    receive_end events; DMR voice TX produces slot-gated burst IQ."""
    import pytest
    from qradiolink_tpu.audio.codecs import codec2_available
    if not codec2_available():
        pytest.skip("codec2 missing")
    import jax.numpy as jnp
    from qradiolink_tpu.fec import ambe
    from qradiolink_tpu.protocols import dmr as dmrp
    from qradiolink_tpu.protocols.dmr import (
        LinkControl, make_voice_superframe, make_lc_burst)
    from qradiolink_tpu.protocols.dmr_stream import build_bs_stream
    from qradiolink_tpu.chains.dmr import DmrMod

    rng = np.random.default_rng(2)
    lc = LinkControl(flco=dmrp.FLCO_GROUP, src_id=44556, dst_id=9)
    payloads = rng.integers(0, 2, (6, 3, 49)).astype(np.uint8)
    voice = ambe.voice_encode(payloads)
    slot2 = ([make_lc_burst(lc, 1, dmrp.DT_VOICE_LC_HEADER)]
             + list(make_voice_superframe(voice, lc, 1))
             + [make_lc_burst(lc, 1, dmrp.DT_TERMINATOR_WITH_LC)])
    idle = dmrp.make_data_burst(np.zeros(196, np.uint8), 1, dmrp.DT_IDLE)
    bits = build_bs_stream([idle] * (len(slot2) + 2), slot2, lead_idle=4)
    mod = DmrMod()
    _, tx = mod(mod.init_state(), jnp.asarray(bits))
    iq = np.asarray(tx["iq"])

    s = Settings()
    s.rx_mode = s.tx_mode = "DMR"
    ctl = RadioController(s)
    ctl.toggle_rx_mode("DMR")
    ctl._dmr_stack().config.timeslot = 2
    blk = 125_000
    n = len(iq) - len(iq) % blk
    events = []
    for i in range(0, n, blk):
        events.extend(ctl.rx_block(iq[i:i + blk]))
    kinds = [e.kind for e in events]
    assert "audio" in kinds, kinds
    assert "receive_end" in kinds
    # the call's source id arrives via header (direct) or the
    # terminator/late-entry snapshot (header may be lost in acquisition)
    ids = [e.text for e in events
           if e.kind in ("callsign", "receive_end") and e.text]
    assert "44556" in ids

    # TX: one second of tone -> burst IQ with TDMA gating (zero gaps)
    t = np.arange(8000) / 8000.0
    pcm = (0.3 * np.sin(2 * np.pi * 400 * t)).astype(np.float32)
    out = ctl.tx_dmr_audio_block(pcm)
    assert out is not None and out.size > 0
    env = np.abs(out)
    assert env.max() > 0.05
    # gated: a meaningful fraction of the stream is idle (masked off)
    assert np.mean(env < env.max() * 0.01) > 0.2


def test_controller_m17_full_duplex_voice():
    """M17 voice TX through the controller, decoded back by the
    controller RX dispatch — the full digital-voice path."""
    import pytest
    from qradiolink_tpu.audio.codecs import codec2_available
    if not codec2_available():
        pytest.skip("codec2 missing")
    s = Settings()
    s.rx_mode = s.tx_mode = "M17"
    s.callsign = "N0TPU"
    tx = RadioController(s)
    t = np.arange(8000 * 2) / 8000.0
    speech = (0.4 * np.sin(2 * np.pi * 250 * t)
              * (0.5 + 0.5 * np.sin(2 * np.pi * 2.5 * t) ** 2)
              ).astype(np.float32)
    iq1 = tx.tx_m17_audio_block(speech[:8000])
    iq2 = tx.tx_m17_audio_block(speech[8000:], last=True)
    iq = np.concatenate([iq1, iq2, np.zeros(60_000, np.complex64)])

    rx = RadioController(s)
    rx.toggle_rx_mode("M17")
    blk = 50_000
    n = len(iq) - len(iq) % blk
    audio, cs = [], []
    for i in range(0, n, blk):
        for ev in rx.rx_block(iq[i:i + blk]):
            if ev.kind == "audio":
                audio.append(ev.audio)
            elif ev.kind == "callsign":
                cs.append(ev.text)
    got = np.concatenate(audio) if audio else np.zeros(0)
    assert got.size > 8000, "too little M17 audio decoded"
    assert any("N0TPU" in c for c in cs), cs


def test_controller_tx_uses_pair_chains_when_supported():
    """The controller builds TX chains in the complex-free IqPair form
    where supported and always hands back numpy complex IQ (get_iq)."""
    import numpy as np
    from qradiolink_tpu.app.controller import RadioController
    from qradiolink_tpu.config import Settings

    ctl = RadioController(Settings(tx_mode="NBFM"))
    ctl.toggle_tx_mode("NBFM")
    assert ctl._tx.fm.pair_out is True
    ctl.start_transmission()
    pcm = (0.3 * np.sin(2 * np.pi * 800 * np.arange(8000) / 8000)
           ).astype(np.float32)
    iq = ctl.tx_audio_block(pcm)
    assert iq is not None and np.iscomplexobj(iq)
    assert np.isfinite(iq).all() and np.abs(iq).max() > 0.01


def test_end_beep(monkeypatch):
    """reference sendTxBeep semantics: 0.4-scaled sound + 1280 samples
    of trailing silence, emitted at PTT release when end_beep is set."""
    import numpy as np
    from qradiolink_tpu.app.controller import RadioController
    from qradiolink_tpu.config import Settings

    ctl = RadioController(Settings(end_beep=1))
    ctl.start_transmission()
    beep = ctl.end_transmission()
    assert beep is not None
    assert np.abs(beep).max() <= 0.6001
    assert np.all(beep[-1280:] == 0.0)
    assert np.abs(beep[: 8000 // 10]).max() > 0.1

    ctl2 = RadioController(Settings(end_beep=0))
    ctl2.start_transmission()
    assert ctl2.end_transmission() is None
    # sound 0 explicitly: the reference's silence block
    z = ctl2.send_tx_beep(0)
    assert z.size == 8192 + 1280 and np.all(z == 0.0)


def test_headless_reference_flag_parity():
    """The reference's service flags (--start-trx --ptt --mmdvm,
    main.cpp:83-107) parse on the headless subcommand."""
    from qradiolink_tpu.app.cli import build_parser

    p = build_parser()
    a = p.parse_args(["headless", "--start-trx", "--ptt"])
    assert a.start_trx and a.ptt and not a.mmdvm
    a = p.parse_args(["headless", "--mmdvm"])
    assert a.mmdvm
