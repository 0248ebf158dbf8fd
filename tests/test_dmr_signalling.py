"""Tier III trunking CSBK builders (reference src/DMR/signalling.cpp,
src/DMR/standard_PDU.h)."""

import numpy as np

from qradiolink_tpu.protocols import dmr
from qradiolink_tpu.protocols.dmr import Csbk
from qradiolink_tpu.protocols.dmr_signalling import (
    StandardAddresses, ServiceKind, auth_check_ahoy, classify,
    clear_channel, grant_channel_slot, group_voice_grant,
    presence_check_ahoy, private_voice_call_request,
    private_voice_grant, registration_request,
    reply_call_denied, reply_message_accepted,
    reply_registration_accepted, reply_wait_for_signalling)


def _roundtrip(c: Csbk) -> Csbk:
    """Through the BPTC burst layer and back."""
    burst = dmr.make_csbk_burst(c, color_code=1)
    d = dmr.decode_burst(burst)
    assert d.kind == "data" and d.data_type == dmr.DT_CSBK
    got = Csbk.from_bytes(d.payload[:12])
    assert got is not None
    return got


def test_grants_roundtrip_channel_slot():
    for fn in (private_voice_grant, group_voice_grant):
        c = fn(channel=0x123, slot=2, src_id=1000, dst_id=2000)
        got = _roundtrip(c)
        assert classify(got) == "grant"
        ch, slot = grant_channel_slot(got)
        assert ch == 0x123 and slot == 2
        assert got.src_id == 1000 and got.dst_id == 2000


def test_ahoy_and_replies():
    c = _roundtrip(presence_check_ahoy(777))
    assert classify(c) == "ahoy"
    assert c.src_id == StandardAddresses.TSI and c.dst_id == 777
    assert c.service_kind == ServiceKind.RegiAuthMSCheck
    c2 = _roundtrip(auth_check_ahoy(777, challenge=0xABCDEF))
    assert c2.src_id == 0xABCDEF

    a = _roundtrip(reply_message_accepted(10, 20))
    assert classify(a) == "ack"
    r = _roundtrip(reply_registration_accepted(10))
    assert r.src_id == StandardAddresses.REGI
    d = _roundtrip(reply_call_denied(10))
    assert classify(d) == "nack"
    w = _roundtrip(reply_wait_for_signalling(10))
    assert classify(w) == "ack"


def test_registration_and_misc():
    c = _roundtrip(registration_request(system_identity_code=0x1234))
    assert classify(c) == "announcement"
    q = _roundtrip(private_voice_call_request(111, 222))
    assert classify(q) == "call_request"
    assert q.src_id == 111 and q.dst_id == 222
    cl = _roundtrip(clear_channel(91, group_call=True))
    assert classify(cl) == "clear"


def test_dmr_utils_group_numbers():
    from qradiolink_tpu.protocols.dmr_utils import (
        base10_group_to_base11, base11_group_to_base10)
    # true roundtrip holds for <=5-digit groups (each digit < 10)
    for gid in (1, 9, 91, 1234, 99999):
        assert base11_group_to_base10(base10_group_to_base11(gid)) == gid
    # larger groups use the reference's big-three/small-four split
    # (dmrutils.cpp:25-42,77); reference-exact values (the pair is NOT
    # a strict inverse for digits that fold through base11()'s '10'
    # digit — same behavior as the C++)
    wire = base10_group_to_base11(2345678)
    assert wire == (8 + 7 * 11 + 6 * 121 + 5 * 1331 + 4 * 14641
                    + 3 * 146410 + 2 * 1464100) == 3433460
    assert base11_group_to_base10(wire) == 2455678
    assert base10_group_to_base11(0) == 0
    assert base10_group_to_base11(10_000_000) == 0


def test_rc4_auth_challenge_response():
    from qradiolink_tpu.protocols.dmr_utils import (
        auth_challenge_response, auth_check, _rc4_keystream)
    # RC4 known-answer: key 'Key' -> keystream starts EB9F7781B734...
    ks = _rc4_keystream(b"Key", 6)
    assert ks.hex().upper() == "EB9F7781B734"
    key = bytes(range(16))
    ch, resp = auth_challenge_response(key)
    assert 0 <= ch <= 0xFFFCDF and 0 <= resp <= 0xFFFFFF
    assert auth_check(key, ch, resp)
    assert not auth_check(key, ch, resp ^ 1)
    # deterministic with a fixed challenge
    _, r2 = auth_challenge_response(key, challenge=ch)
    assert r2 == resp


def test_dmr_id_lookup(tmp_path):
    from qradiolink_tpu.protocols.dmr_utils import DmrIdLookup
    db = tmp_path / "DMRIds.dat"
    db.write_text("2345678\tN0CALL\tAlice\n1234567,M0XYZ,Bob\nbad line\n")
    lk = DmrIdLookup(db)
    assert len(lk) == 2
    assert lk.lookup(2345678) == "2345678 - N0CALL - Alice"
    assert lk.lookup(42) == "42"
    lk.add(42, "K1ABC", "Carol")
    assert "K1ABC" in lk.lookup(42)


def test_text_parsing():
    from qradiolink_tpu.protocols.dmr_utils import parse_iso7, parse_utf16
    assert parse_utf16("héllo".encode("utf-16-be")) == "héllo"
    import numpy as np
    chars = "HELLO42"
    bits = np.concatenate([
        [(ord(c) >> (6 - i)) & 1 for i in range(7)] for c in chars])
    packed = np.packbits(bits.astype(np.uint8)).tobytes()
    assert parse_iso7(packed, len(chars)) == chars
