"""Command processor + telnet server (reference
src/commandprocessor.cpp verb table, src/telnetserver.cpp)."""

import socket

import numpy as np

from qradiolink_tpu.app.command import CommandProcessor
from qradiolink_tpu.app.controller import RadioController
from qradiolink_tpu.app.telnet import TelnetServer
from qradiolink_tpu.config import Settings, RadioChannels, MemoryChannel


def _proc():
    s = Settings()
    s.rx_mode = s.tx_mode = "NBFM"
    ctl = RadioController(s)
    ch = RadioChannels()
    ch.channels.append(MemoryChannel(name="APRS", rx_frequency=144_800_000,
                                     rx_mode="NBFM", tx_mode="NBFM"))
    return CommandProcessor(ctl, channels=ch), ctl


def test_status_and_set_verbs():
    p, ctl = _proc()
    assert p.process("rxstatus") == "RX inactive"
    assert "Starting receiver" in p.process("setrx 1")
    assert p.process("rxstatus") == "RX active"
    assert "NBFM" in p.process("rxmode")
    assert "Setting squelch" in p.process("setsquelch -120")
    assert ctl.settings.squelch_db == -120
    assert p.process("setsquelch 999") == "Parameter value is not supported"
    assert "Tuning receiver to 145500000" in p.process("tunerx 145500000")
    assert p.process("rxfreq") == "145500000"
    assert "Setting RX volume" in p.process("setrxvolume 55")
    assert abs(ctl.settings.rx_volume - 0.55) < 1e-9
    assert "Setting demodulator offset" in p.process("setoffset 5000")
    assert p.process("nosuchverb") == "Command not recognized"
    assert p.process("setsquelch") == \
        "Command parameters are missing or incorrect"
    assert "Available commands" in p.process("help")
    assert "rxstatus" in p.process("?")


def test_mode_switch_and_ptt():
    p, ctl = _proc()
    modes = p.process("list_modes").splitlines()
    am_idx = next(i for i, m in enumerate(modes) if m.endswith(" AM"))
    assert "Setting RX mode to AM" in p.process(f"setrxmode {am_idx}")
    assert ctl._rx_mode == "AM"
    # by-name also accepted
    assert "Setting TX mode to NBFM" in p.process("settxmode NBFM")
    assert "PTT on" in p.process("ptt_on")
    assert ctl.transmitting
    assert "PTT off" in p.process("ptt_off")
    assert not ctl.transmitting


def test_memory_channels_and_shutdown():
    p, ctl = _proc()
    assert "APRS" in p.process("listradiochan")
    assert "Changing to memory channel APRS" in p.process("setradiochan 0")
    assert ctl.settings.rx_frequency == 144_800_000
    assert "Shutting down" in p.process("shutdown")
    assert p.shutdown_requested


def test_telnet_session_changes_mode_and_triggers_tx():
    p, ctl = _proc()
    srv = TelnetServer(p, port=0)      # ephemeral port
    srv.start()
    try:
        with socket.create_connection(("127.0.0.1", srv.port), timeout=5) as c:
            f = c.makefile("rwb")
            assert b"Welcome" in f.readline()
            f.readline()               # banner line 2
            def cmd(s):
                f.write(s.encode() + b"\n"); f.flush()
                return f.readline().decode()
            assert "Setting RX mode to AM" in cmd("setrxmode AM")
            assert ctl._rx_mode == "AM"
            assert "PTT on" in cmd("ptt_on")
            assert ctl.transmitting
            assert "PTT off" in cmd("ptt_off")
            assert "Bye" in cmd("quit")
    finally:
        srv.stop()


def test_audio_recorder_verb(tmp_path, monkeypatch):
    import os
    monkeypatch.chdir(tmp_path)
    p, ctl = _proc()
    assert "Not recording" in p.process("recordstatus")
    assert "Setting audio recording to 1" in p.process("setaudiorecorder 1")
    assert "Recording" in p.process("recordstatus")
    assert "Setting audio recording to 0" in p.process("setaudiorecorder 0")
    assert ctl._recorder.path is not None
    assert os.path.exists(ctl._recorder.path)
