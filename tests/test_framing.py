import numpy as np
import pytest

from qradiolink_tpu.framing.layer1 import (
    FrameType, Layer1Framer, Deframer, MODE_FRAME_CONFIG)
from qradiolink_tpu.framing.layer2 import (
    build_layer2_frame, parse_layer2_frame, PageMessage, MSG_PAGE)


def bits_of(data: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, np.uint8))


def test_header_voice_wideband():
    f = Layer1Framer("4FSK2K")
    assert f.header(FrameType.VOICE_2) == bytes([0xED, 0x89, 0xAA])


def test_header_voice_narrowband():
    f = Layer1Framer("BPSK1K")
    assert f.header(FrameType.VOICE_1) == bytes([0xB5])


def test_header_data_types():
    f = Layer1Framer("QPSK250K")
    assert f.header(FrameType.IP) == bytes([0xDE, 0x98, 0xAA])
    assert f.header(FrameType.END) == bytes([0x4C, 0x8A, 0x2B])


def test_voice_roundtrip_wideband():
    f = Layer1Framer("4FSK2K")
    payload = bytes(range(7))
    wire = f.frame(payload, FrameType.VOICE_2)
    d = Deframer("4FSK2K")
    # prepend some noise bits, append idle
    rng = np.random.default_rng(0)
    stream = np.concatenate([
        rng.integers(0, 2, 37).astype(np.uint8), bits_of(wire),
        np.zeros(64, np.uint8)])
    frames = d.process(stream)
    assert len(frames) == 1
    ft, data = frames[0]
    assert ft == FrameType.VOICE_2
    assert data == payload


def test_voice_roundtrip_narrowband():
    f = Layer1Framer("BPSK1K")
    payload = bytes([1, 2, 3, 4])
    wire = f.frame(payload, FrameType.VOICE_1)
    d = Deframer("BPSK1K")
    frames = d.process(np.concatenate([np.zeros(11, np.uint8),
                                       bits_of(wire)]))
    assert len(frames) == 1
    assert frames[0][0] == FrameType.VOICE_1
    assert frames[0][1] == payload


def test_text_frame_roundtrip():
    f = Layer1Framer("4FSK2K")
    payload = b"hello\x00\x00"
    wire = f.frame(payload, FrameType.TEXT)
    d = Deframer("4FSK2K")
    frames = d.process(bits_of(b"\x00" + wire + b"\x00"))
    assert len(frames) == 1
    assert frames[0][0] == FrameType.TEXT
    assert frames[0][1] == payload


def test_ip_frame_roundtrip_burst_preamble():
    f = Layer1Framer("QPSK250K", burst_ip=True)
    payload = bytes(np.random.default_rng(1).integers(0, 256, 1516,
                                                      dtype=np.uint8))
    wire = f.frame(payload, FrameType.IP)
    assert wire[:10] == b"\xAA" * 10
    d = Deframer("QPSK250K")
    frames = d.process(bits_of(wire))
    assert len(frames) == 1
    assert frames[0][0] == FrameType.IP
    assert frames[0][1] == payload


def test_frame_split_across_blocks():
    f = Layer1Framer("4FSK2K")
    payload = bytes(range(7))
    wire = bits_of(f.frame(payload, FrameType.VOICE_2))
    d = Deframer("4FSK2K")
    out = []
    for part in np.array_split(wire, 5):
        out += d.process(part)
    assert len(out) == 1
    assert out[0][1] == payload


def test_multiple_frames_in_block():
    f = Layer1Framer("4FSK2K")
    p1, p2 = bytes(range(7)), bytes(range(7, 14))
    stream = bits_of(f.frame(p1, FrameType.VOICE_2)
                     + f.frame(p2, FrameType.VOICE_2))
    d = Deframer("4FSK2K")
    frames = d.process(stream)
    assert [fr[1] for fr in frames] == [p1, p2]


def test_end_frame_detected():
    f = Layer1Framer("4FSK2K")
    d = Deframer("4FSK2K")
    frames = d.process(bits_of(b"\x00" + f.end_frame() + b"\x00\x00" * 8))
    assert any(fr[0] == FrameType.END for fr in frames)


def test_no_false_sync_on_random_bits():
    """Random bits will occasionally alias to syncs; just ensure no crash
    and frames have the right payload size."""
    d = Deframer("4FSK2K")
    rng = np.random.default_rng(2)
    frames = d.process(rng.integers(0, 2, 5000).astype(np.uint8))
    for ft, data in frames:
        assert len(data) <= MODE_FRAME_CONFIG["4FSK2K"].frame_length


def test_layer2_roundtrip():
    msg = PageMessage("CALL1", "CALL2", "hello there")
    frame = build_layer2_frame(msg.encode(), MSG_PAGE)
    parsed = parse_layer2_frame(frame)
    assert parsed is not None
    t, payload = parsed
    assert t == MSG_PAGE
    out = PageMessage.decode(payload)
    assert out == msg


def test_layer2_crc_failure():
    frame = bytearray(build_layer2_frame(b"abc"))
    frame[6] ^= 0xFF
    assert parse_layer2_frame(bytes(frame)) is None


def test_layer2_protobuf_wire_compat():
    """Our minimal proto2 codec must interchange with real protobuf
    (validated against protoc-generated python when available, else
    self-roundtrip)."""
    from qradiolink_tpu.framing.layer2 import (
        PageMessage, page_message_to_proto, page_message_from_proto,
        repeater_info_to_proto, repeater_info_from_proto)

    m = PageMessage(target_callsign="N0CALL", source_callsign="M0ABC",
                    message="hello page")
    wire = page_message_to_proto(m)
    got = page_message_from_proto(wire)
    assert got.target_callsign == "N0CALL"
    assert got.source_callsign == "M0ABC" and got.message == "hello page"

    chans = [(1, 0, "Main", "Main channel"), (2, 1, "Sub", "")]
    users = [(7, "op1", 100, 1)]
    wire2 = repeater_info_to_proto(chans, users)
    c2, u2 = repeater_info_from_proto(wire2)
    assert c2 == chans and u2 == users

    # cross-validate against the real protobuf runtime if installed
    try:
        import subprocess, tempfile, os, sys
        import google.protobuf  # noqa: F401
    except ImportError:
        return
    with tempfile.TemporaryDirectory() as td:
        proto = os.path.join(td, "QRadioLink.proto")
        open(proto, "w").write('''
syntax="proto2";
package QRadioLink;
message PageMessage {
    required string calling_user = 1;
    required string called_user = 2;
    optional string msg = 3;
    optional bool retransmit = 4;
}
''')
        r = subprocess.run(["protoc", f"--python_out={td}",
                            f"--proto_path={td}", proto],
                           capture_output=True)
        if r.returncode != 0:
            return
        sys.path.insert(0, td)
        try:
            import QRadioLink_pb2 as pb
            msg = pb.PageMessage()
            msg.ParseFromString(wire)
            assert msg.calling_user == "M0ABC"
            assert msg.called_user == "N0CALL"
            assert msg.msg == "hello page"
        finally:
            sys.path.remove(td)
            sys.modules.pop("QRadioLink_pb2", None)
