"""BCH(63,16) vs golden vectors from the compiled reference
(/root/reference/src/MMDVM/BCH.cpp built unmodified; fixture
tests/fixtures/bch_golden.json)."""

import json
import pathlib

import numpy as np
import pytest

from qradiolink_tpu.fec.bch import bch_encode, encode_nid, N, K

pytestmark = pytest.mark.fast

FIX = json.loads((pathlib.Path(__file__).parent / "fixtures" /
                  "bch_golden.json").read_text())


def test_encode_nid_bit_exact_vs_compiled_reference():
    for case in FIX["cases"]:
        out = encode_nid(bytes.fromhex(case["in"]))
        # the reference leaves bit 63 (and trailing bytes) untouched
        assert out.hex() == case["out"], case


def test_batched_codewords_match_bytewise_path():
    rng = np.random.default_rng(0)
    data = rng.integers(0, 2, (32, K)).astype(np.float32)
    cw = np.asarray(bch_encode(data))
    assert cw.shape == (32, N)
    for row, d in zip(cw, data):
        packed = np.packbits(np.concatenate([d.astype(np.uint8),
                                             np.zeros(64 - K, np.uint8)]))
        ref = np.unpackbits(np.frombuffer(encode_nid(packed.tobytes()),
                                          np.uint8))[:N]
        np.testing.assert_array_equal(row, ref)


def test_codewords_are_valid_bch():
    """Every codeword must be divisible by g(x) — parity check via the
    same generator used to build the matrix."""
    from qradiolink_tpu.fec.bch import _G, _lfsr_parity
    rng = np.random.default_rng(1)
    d = rng.integers(0, 2, K).astype(np.int64)
    cw = np.asarray(bch_encode(d.astype(np.float32)))
    # systematic: data then parity == LFSR parity
    np.testing.assert_array_equal(cw[K:], _lfsr_parity(d))
