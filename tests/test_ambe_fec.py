"""AMBE DMR voice FEC vs golden vectors from the reference MMDVM library.

Fixtures in tests/fixtures/ambe_golden.json were produced by compiling
the reference C++ (src/MMDVM/{AMBEFEC,Golay24128,Hamming,CRC}.cpp) into
a standalone generator driven by an LCG PRNG — the JSON is pure data
(inputs + reference outputs); no reference code lives in this repo.
"""

import json
import pathlib

import numpy as np

from qradiolink_tpu.fec import ambe

FIX = json.loads(
    (pathlib.Path(__file__).parent / "fixtures" / "ambe_golden.json")
    .read_text())


def _burst_voice_bits(hex33: str) -> np.ndarray:
    """33-byte burst -> (216,) voice bits (bits 0..107 and 156..263)."""
    bits = np.unpackbits(np.frombuffer(bytes.fromhex(hex33), np.uint8))
    return np.concatenate([bits[:108], bits[156:264]])


def test_golay24128_word_encode_matches_reference():
    for case in FIX["golay24128"]:
        assert int(ambe.golay24_encode_word(case["data"])) == case["enc24"]
        assert int(ambe.golay23_encode_word(case["data"])) << 1 == case["enc23"]


def test_regenerate_matches_reference():
    ins = np.stack([_burst_voice_bits(c["in"]) for c in FIX["ambe_regen"]])
    outs = np.stack([_burst_voice_bits(c["out"]) for c in FIX["ambe_regen"]])
    errs = np.array([c["errors"] for c in FIX["ambe_regen"]])
    got, got_errs = ambe.regenerate_voice(ins)
    np.testing.assert_array_equal(got_errs, errs)
    np.testing.assert_array_equal(got, outs)


def test_prng_table_nonzero_and_shape():
    assert ambe.PRNG_TABLE.shape == (4096,)
    assert ambe.PRNG_TABLE.max() <= 0xFFFFFF


def test_self_consistent_roundtrip_and_correction():
    rng = np.random.default_rng(11)
    payloads = rng.integers(0, 2, (8, 3, 49)).astype(np.uint8)
    voice = ambe.voice_encode(payloads)
    assert voice.shape == (8, 216)
    # clean: identity regeneration, zero errors
    regen, errs = ambe.regenerate_voice(voice)
    np.testing.assert_array_equal(regen, voice)
    assert errs.sum() == 0
    # decode recovers payloads
    dec, derr = ambe.voice_decode(voice)
    np.testing.assert_array_equal(dec, payloads)
    assert derr.sum() == 0
    # up to 3 errors per Golay word are corrected
    noisy = voice.copy().reshape(8, 3, 72)
    for i in range(8):
        for k in range(3):
            for pos in rng.choice(ambe.A_TABLE, 3, replace=False):
                noisy[i, k, pos] ^= 1
            for pos in rng.choice(ambe.B_TABLE, 2, replace=False):
                noisy[i, k, pos] ^= 1
    dec2, derr2 = ambe.voice_decode(noisy.reshape(8, 216))
    np.testing.assert_array_equal(dec2, payloads)
    assert (derr2 == 15).all()
