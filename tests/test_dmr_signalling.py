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
