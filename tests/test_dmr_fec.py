"""DMR FEC layer vs golden vectors from the reference MMDVM library.

Fixtures in tests/fixtures/dmr_golden.json were produced by compiling the
reference C++ (src/MMDVM/{BPTC19696,RS129,DMRTrellis,DMRSlotType,DMREMB,
DMRFullLC,DMRShortLC,CRC}.cpp) into a standalone generator driven by an
LCG PRNG — the JSON is pure data (inputs + reference outputs), no
reference code lives in this repo. This is the SURVEY §4.1 golden-vector
level that loopback tests cannot provide.
"""

import json
import pathlib

import numpy as np

from qradiolink_tpu.fec import bptc, rs129, trellis34
from qradiolink_tpu.fec.crc import crc16_ccitt

FIX = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "dmr_golden.json").read_text())


def _hex_bits(h: str) -> np.ndarray:
    """hex string -> bit array, MSB-first per byte (CUtils::byteToBitsBE)."""
    b = np.frombuffer(bytes.fromhex(h), np.uint8)
    return np.unpackbits(b)


def _info_bits(frame_hex: str) -> np.ndarray:
    """33-byte DMR burst -> its 196 info bits.

    The burst layout is 98 info + 68 center (slot type halves + sync) +
    98 info (BPTC19696.cpp decode byte mapping: bits 0..97 and 166..263).
    """
    bits = _hex_bits(frame_hex)
    return np.concatenate([bits[:98], bits[166:264]])


def test_bptc_encode_matches_reference():
    for case in FIX["bptc"]:
        data = _hex_bits(case["data"])
        got = np.asarray(bptc.encode(data))
        np.testing.assert_array_equal(got, _info_bits(case["frame"]))


def test_bptc_decode_roundtrip_and_correction():
    rng = np.random.default_rng(7)
    data = rng.integers(0, 2, (8, 96)).astype(np.uint8)
    enc = np.asarray(bptc.encode(data))
    dec, ok = bptc.decode(enc)
    np.testing.assert_array_equal(np.asarray(dec), data)
    assert np.all(np.asarray(ok))
    # flip one bit per row + one bit per column region: correctable
    noisy = enc.copy()
    for i in range(8):
        noisy[i, rng.integers(0, 196)] ^= 1
        noisy[i, rng.integers(0, 196)] ^= 1
    dec, _ = bptc.decode(noisy)
    np.testing.assert_array_equal(np.asarray(dec), data)


def test_bptc_decode_golden_frames():
    for case in FIX["bptc"]:
        dec, ok = bptc.decode(_info_bits(case["frame"]))
        np.testing.assert_array_equal(np.asarray(dec), _hex_bits(case["data"]))
        assert bool(np.asarray(ok))


def test_rs129_generator_polynomial():
    # expanding (x-a)(x-a^2)(x-a^3) reproduces the reference POLY table
    # {64, 56, 14, 1} (RS129.cpp:31)
    np.testing.assert_array_equal(rs129.POLY, [64, 56, 14])


def test_rs129_encode_matches_reference():
    for case in FIX["rs129"]:
        msg = np.frombuffer(bytes.fromhex(case["msg"]), np.uint8)
        par = np.frombuffer(bytes.fromhex(case["parity"]), np.uint8)
        got = rs129.encode(msg)
        # reference getData emits registers high-to-low: parity bytes are
        # appended to the LC as par[2], par[1], par[0] (DMRFullLC.cpp)
        np.testing.assert_array_equal(got, par[::-1])
        cw = np.concatenate([msg, par[::-1]])
        assert bool(rs129.check(cw))
        cw[3] ^= 0x40
        assert not bool(rs129.check(cw))


def test_trellis_encode_matches_reference():
    for case in FIX["trellis"]:
        payload = _hex_bits(case["payload"])
        got = trellis34.encode(payload)
        np.testing.assert_array_equal(got, _info_bits(case["frame"]))


def test_trellis_decode_roundtrip_and_correction():
    rng = np.random.default_rng(3)
    payload = rng.integers(0, 2, (4, 144)).astype(np.uint8)
    enc = trellis34.encode(payload)
    dec, ok = trellis34.decode(enc)
    np.testing.assert_array_equal(dec, payload)
    assert np.all(ok)
    # a flipped bit moves one constellation point; the Viterbi picks the
    # nearest valid path. A single-point error is not always uniquely
    # decodable at rate 3/4 (nor by the reference's greedy fixCode), so
    # assert damage stays local (<= 2 tribits per frame) and is flagged.
    noisy = enc.copy()
    noisy[:, 40] ^= 1
    dec, ok = trellis34.decode(noisy)
    errs = (dec != payload).sum(axis=-1)
    assert np.all(errs <= 6)
    assert not np.any(ok)  # ok flags zero-error paths only


def test_full_lc_header_composition():
    # voice LC header = 9 LC bytes + RS(12,9) parity (XOR-masked by data
    # type in the reference via lcss... the VOICE_LC_HEADER_CRC_MASK)
    # then BPTC(196,96) encoded. Reference: DMRFullLC.cpp encode.
    for case in FIX["fulllc"]:
        lc = np.frombuffer(bytes.fromhex(case["lc"]), np.uint8)
        parity = rs129.encode(lc)
        # VOICE_LC_HEADER_CRC_MASK = 0x96, 0x96, 0x96 (DMRDefines.h)
        parity = parity ^ 0x96
        bits = np.unpackbits(np.concatenate([lc, parity]))
        got = np.asarray(bptc.encode(bits))
        np.testing.assert_array_equal(got, _info_bits(case["frame"]))


def test_crc_ccitt162_matches_reference():
    # reference CRC.cpp:148-167: init 0x0000, MSB-first 0x1021, final
    # complement, stored big-endian
    for case in FIX["crc_ccitt162"]:
        data = bytes.fromhex(case["data"])
        want = int.from_bytes(bytes.fromhex(case["crc"]), "big")
        assert (crc16_ccitt(data, init=0) ^ 0xFFFF) == want
