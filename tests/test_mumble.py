"""Mumble VOIP client vs a fake server (reference src/mumbleclient.cpp
protocol: Version/Authenticate/ServerSync handshake, channel/user
state, text messages, legacy Opus voice through the TCP tunnel)."""

import socket
import struct
import threading

import numpy as np
import pytest

from qradiolink_tpu.framing.layer2 import _pb_scan, _pb_str, _pb_uint
from qradiolink_tpu.voip.mumble import (
    MumbleClient, MSG_AUTHENTICATE, MSG_CHANNELSTATE, MSG_PING,
    MSG_SERVERSYNC, MSG_TEXTMESSAGE, MSG_UDPTUNNEL, MSG_USERSTATE,
    MSG_VERSION, VOICE_OPUS, mumble_varint, read_mumble_varint)


def test_mumble_varint_roundtrip():
    for v in (0, 1, 127, 128, 300, 16383, 16384, 2_000_000,
              200_000_000, 2**40):
        data = mumble_varint(v)
        got, pos = read_mumble_varint(data, 0)
        assert got == v and pos == len(data)


class FakeServer(threading.Thread):
    """Speaks enough Mumble to sync a client, relay a text message,
    and loop a voice packet back with a sender session."""

    def __init__(self):
        super().__init__(daemon=True)
        self.sock = socket.socket()
        self.sock.bind(("127.0.0.1", 0))
        self.sock.listen(1)
        self.port = self.sock.getsockname()[1]
        self.received = []

    def _recv_msg(self, c):
        head = b""
        while len(head) < 6:
            chunk = c.recv(6 - len(head))
            if not chunk:
                return None, None
            head += chunk
        mtype, ln = struct.unpack(">HI", head)
        payload = b""
        while len(payload) < ln:
            payload += c.recv(ln - len(payload))
        return mtype, payload

    def _send(self, c, mtype, payload):
        c.sendall(struct.pack(">HI", mtype, len(payload)) + payload)

    def run(self):
        c, _ = self.sock.accept()
        try:
            while True:
                mtype, payload = self._recv_msg(c)
                if mtype is None:
                    break
                self.received.append((mtype, payload))
                if mtype == MSG_AUTHENTICATE:
                    # channel tree + another user + sync
                    self._send(c, MSG_CHANNELSTATE,
                               _pb_uint(1, 0) + _pb_str(3, "Root"))
                    self._send(c, MSG_CHANNELSTATE,
                               _pb_uint(1, 7) + _pb_uint(2, 0)
                               + _pb_str(3, "Radio"))
                    self._send(c, MSG_USERSTATE,
                               _pb_uint(1, 33) + _pb_str(3, "K1OTH")
                               + _pb_uint(5, 7))
                    self._send(c, MSG_SERVERSYNC, _pb_uint(1, 42))
                elif mtype == MSG_TEXTMESSAGE:
                    # echo back as from user 33
                    f = {k: v for k, _w, v in _pb_scan(payload)}
                    self._send(c, MSG_TEXTMESSAGE,
                               _pb_uint(1, 33) + _pb_uint(3, 7)
                               + _pb_str(5, (f.get(5, b"")).decode()))
                elif mtype == MSG_UDPTUNNEL:
                    # reflect voice with sender session prepended
                    head = payload[0:1]
                    rest = payload[1:]
                    self._send(c, MSG_UDPTUNNEL,
                               head + mumble_varint(33) + rest)
        finally:
            c.close()
            self.sock.close()


def test_mumble_session():
    srv = FakeServer()
    srv.start()
    cl = MumbleClient("127.0.0.1", srv.port, username="N0CALL",
                      use_ssl=False)
    events = {"text": [], "voice": [], "joined": []}
    cl.on_text = lambda m, s, ch: events["text"].append((m, s, ch))
    cl.on_voice = lambda sid, opus: events["voice"].append((sid, opus))
    cl.on_user_joined = lambda st: events["joined"].append(st)
    cl.connect()
    for _ in range(100):
        cl.poll()
        if cl.synchronized:
            break
    assert cl.synchronized and cl.session == 42
    assert 7 in cl.channels and cl.channels[7].name == "Radio"
    assert events["joined"] and events["joined"][0].callsign == "K1OTH"

    cl.join_channel(7)
    cl.send_text("hello net")
    opus = b"\x01\x02\x03\x04fake-opus"
    cl.send_opus_voice(opus)
    import time
    for _ in range(200):
        cl.poll()
        if events["text"] and events["voice"]:
            break
        time.sleep(0.01)
    assert events["text"] and events["text"][0][0] == "hello net"
    assert events["text"][0][1] == "K1OTH" and events["text"][0][2]
    assert events["voice"] and events["voice"][0] == (33, opus)

    # client sent version + auth + (userstate join) + text + voice
    types = [t for t, _ in srv.received]
    assert types[0] == MSG_VERSION and types[1] == MSG_AUTHENTICATE
    assert MSG_USERSTATE in types and MSG_PING in types
    cl.close()
    srv.join(timeout=2)


def test_voice_packet_format():
    """The TX voice packet must follow the legacy layout the reference
    builds (header byte, varint seq, varint length, payload)."""
    srv = FakeServer()
    srv.start()
    cl = MumbleClient("127.0.0.1", srv.port, use_ssl=False)
    cl.connect()
    for _ in range(100):
        cl.poll()
        if cl.synchronized:
            break
    payload = b"OPUSDATA"
    cl.send_opus_voice(payload, target=0)
    import time
    time.sleep(0.2)
    cl.poll()
    tun = [p for t, p in srv.received if t == MSG_UDPTUNNEL]
    assert tun, "no tunneled voice received by server"
    data = tun[0]
    assert data[0] >> 5 == VOICE_OPUS
    seq, pos = read_mumble_varint(data, 1)
    ln, pos = read_mumble_varint(data, pos)
    assert data[pos:pos + (ln & 0x1FFF)] == payload
    cl.close()
    srv.join(timeout=2)


def test_voip_forwarder_text_remote_control():
    """Private Mumble texts drive the command processor; responses go
    back as texts (reference commandprocessor.h:131)."""
    from qradiolink_tpu.voip.forwarder import VoipForwarder
    from qradiolink_tpu.app.command import CommandProcessor
    from qradiolink_tpu.app.controller import RadioController
    from qradiolink_tpu.config import Settings

    class StubClient:
        synchronized = True
        sent = []
        def __init__(self):
            self.on_voice = None
            self.on_text = None
        def send_text(self, m, **kw):
            self.sent.append(m)

    cl = StubClient()
    ctl = RadioController(Settings())
    fwd = VoipForwarder(cl, codec=None,
                        command_processor=CommandProcessor(ctl))
    cl.on_text("rxstatus", "op", False)      # private -> command
    assert cl.sent and "RX inactive" in cl.sent[0]
    cl.sent.clear()
    cl.on_text("chat chatter", "op", True)   # channel msg -> ignored
    assert not cl.sent


def test_voip_forwarder_voice_mixing():
    import pytest
    from qradiolink_tpu.audio.codecs import opus_available
    if not opus_available():
        pytest.skip("opus missing")
    from qradiolink_tpu.voip.forwarder import VoipForwarder
    from qradiolink_tpu.audio.codecs import AudioEncoder

    class StubClient:
        synchronized = True
        packets = []
        def __init__(self):
            self.on_voice = None
            self.on_text = None
        def send_opus_voice(self, p, **kw):
            self.packets.append(p)

    cl = StubClient()
    fwd = VoipForwarder(cl, codec=AudioEncoder())
    t = np.arange(640) / 8000.0
    tone = (0.3 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    fwd.radio_rx_audio(tone)
    assert len(cl.packets) == 2          # two 40 ms Opus packets
    # loop one back in as if from user 33 and mix
    cl.on_voice(33, cl.packets[0])
    frame = fwd.mixed_frame()
    assert frame is not None and frame.shape == (320,)
    assert np.abs(frame).max() > 500
