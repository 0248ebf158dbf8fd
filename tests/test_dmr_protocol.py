"""DMR frame-layer tests: golden vectors from the reference MMDVM
implementations (tests/fixtures/dmr_golden.json — see test_dmr_fec.py
for provenance) plus round-trip and state-machine tests."""

import json
import pathlib

import numpy as np

from qradiolink_tpu.protocols import dmr

FIX = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "dmr_golden.json").read_text())


def _hex_bits(h: str) -> np.ndarray:
    return np.unpackbits(np.frombuffer(bytes.fromhex(h), np.uint8))


def test_slot_type_golden():
    for case in FIX["slottype"]:
        frame = _hex_bits(case["frame"])
        st = dmr.extract_slot_type(frame)
        np.testing.assert_array_equal(
            st, dmr.slot_type_encode(case["cc"], case["dt"]))
        cc, dt, ok = dmr.slot_type_decode(st)
        assert (int(cc), int(dt), bool(ok)) == (case["cc"], case["dt"], True)


def test_emb_golden():
    for case in FIX["emb"]:
        frame = _hex_bits(case["frame"])
        emb = dmr.extract_emb(frame)
        np.testing.assert_array_equal(
            emb, dmr.emb_encode(case["cc"], bool(case["pi"]), case["lcss"]))
        cc, pi, lcss, ok = dmr.emb_decode(emb)
        assert (int(cc), bool(pi), int(lcss), bool(ok)) == \
            (case["cc"], bool(case["pi"]), case["lcss"], True)


def test_full_lc_golden():
    for case in FIX["fulllc"]:
        lc9 = np.frombuffer(bytes.fromhex(case["lc"]), np.uint8)
        frame = _hex_bits(case["frame"])
        got = dmr.full_lc_encode(lc9, dmr.DT_VOICE_LC_HEADER)
        np.testing.assert_array_equal(got, dmr.extract_info(frame))
        dec, ok = dmr.full_lc_decode(dmr.extract_info(frame),
                                     dmr.DT_VOICE_LC_HEADER)
        np.testing.assert_array_equal(np.asarray(dec).reshape(-1), lc9)
        assert bool(np.asarray(ok).reshape(-1)[0])


def test_short_lc_golden():
    for case in FIX["shortlc"]:
        # reference packs the 36 payload bits at offset 4 of the 5 input
        # bytes (DMRShortLC.cpp encodeExtractData: bData[4..40))
        payload = _hex_bits(case["in"])[4:40]
        want = _hex_bits(case["out"])[:68]
        got = dmr.short_lc_encode(payload)
        np.testing.assert_array_equal(got, want)
        dec, ok = dmr.short_lc_decode(want)
        np.testing.assert_array_equal(dec, payload)
        assert ok


def test_embedded_lc_roundtrip_and_correction():
    lc = dmr.LinkControl(flco=dmr.FLCO_GROUP, dst_id=2351, src_id=2405123)
    frags = dmr.embedded_lc_encode(lc.to_bytes())
    assert frags.shape == (4, 32)
    dec, ok = dmr.embedded_lc_decode(frags)
    assert ok
    np.testing.assert_array_equal(dec, lc.to_bytes())
    # single bit error in a row is corrected by Hamming(16,11,4)
    noisy = frags.copy()
    noisy[1, 7] ^= 1
    dec, ok = dmr.embedded_lc_decode(noisy)
    # parity row check may flag the corrected column; accept decode-correct
    np.testing.assert_array_equal(dec, lc.to_bytes())


def test_embedded_lc_assembler():
    lc = dmr.LinkControl(flco=dmr.FLCO_USER_USER, dst_id=12, src_id=34,
                         fid=0, options=0x20)
    frags = dmr.embedded_lc_encode(lc.to_bytes())
    asm = dmr.EmbeddedLCAssembler()
    out = None
    for i, lcss in enumerate(dmr.EMBEDDED_LCSS):
        out = asm.add(frags[i], lcss)
    assert out is not None
    assert (out.flco, out.dst_id, out.src_id, out.options) == \
        (dmr.FLCO_USER_USER, 12, 34, 0x20)


def test_cach_roundtrip():
    payload = np.arange(17) % 2
    cach = dmr.cach_encode(at=1, tc=1, lcss=2, payload17=payload)
    at, slot_no, lcss, pl, ok = dmr.cach_decode(cach)
    assert (at, slot_no, lcss, ok) == (1, 2, 2, True)
    np.testing.assert_array_equal(pl, payload)
    # corrupt a TACT parity bit -> flagged
    bad = cach.copy()
    bad[14] ^= 1
    assert not dmr.cach_decode(bad)[4]


def test_voice_superframe_and_burst_decode():
    rng = np.random.default_rng(5)
    voice = rng.integers(0, 2, (6, 216)).astype(np.uint8)
    lc = dmr.LinkControl(dst_id=9, src_id=2405321)
    bursts = dmr.make_voice_superframe(voice, lc, color_code=1)
    assert bursts.shape == (6, 264)
    # frame A carries the audio sync
    d0 = dmr.decode_burst(bursts[0])
    assert d0.kind == "voice_sync"
    np.testing.assert_array_equal(d0.voice_bits, voice[0])
    # frames B..F are EMB voice; assembling B..E recovers the LC
    asm = dmr.EmbeddedLCAssembler()
    out = None
    for fn in range(1, 6):
        d = dmr.decode_burst(bursts[fn])
        assert d.kind == "voice" and d.color_code == 1
        np.testing.assert_array_equal(d.voice_bits, voice[fn])
        if fn <= 4:
            out = out or asm.add(d.embedded_fragment, d.emb_lcss)
    assert out is not None and out.src_id == 2405321 and out.dst_id == 9


def test_lc_header_and_data_burst_decode():
    lc = dmr.LinkControl(dst_id=91, src_id=123456)
    burst = dmr.make_lc_burst(lc, color_code=7, data_type=dmr.DT_VOICE_LC_HEADER)
    d = dmr.decode_burst(burst)
    assert d.kind == "data" and d.data_type == dmr.DT_VOICE_LC_HEADER
    assert d.ok and d.color_code == 7
    assert d.lc.src_id == 123456 and d.lc.dst_id == 91

    payload = np.arange(12, dtype=np.uint8)
    b12 = dmr.make_rate12_burst(payload, color_code=3)
    d = dmr.decode_burst(b12)
    assert d.ok and d.data_type == dmr.DT_RATE_12_DATA
    np.testing.assert_array_equal(d.payload, payload)

    payload = np.arange(18, dtype=np.uint8)
    b34 = dmr.make_rate34_burst(payload, color_code=3)
    d = dmr.decode_burst(b34)
    assert d.ok and d.data_type == dmr.DT_RATE_34_DATA
    np.testing.assert_array_equal(d.payload, payload)


def test_symbols_roundtrip():
    rng = np.random.default_rng(2)
    bits = rng.integers(0, 2, 264).astype(np.uint8)
    syms = dmr.bits_to_symbols(bits)
    assert syms.shape == (132,)
    np.testing.assert_array_equal(dmr.symbols_to_bits(syms), bits)
