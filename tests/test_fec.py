import numpy as np
import jax.numpy as jnp
import pytest

from qradiolink_tpu.fec.conv import (
    ConvCode, CCSDS_K7, conv_encode, viterbi_decode, depuncture)
from qradiolink_tpu.fec.scrambler import Scrambler, Descrambler
from qradiolink_tpu.fec.crc import crc32, crc16_ccitt, crc16_m17, crc8, crc9_dmr
from conftest import run_chunked


def bits_to_soft(coded, flip_idx=()):
    """Hard coded bits -> confident soft bytes, with optional flips."""
    soft = np.where(np.asarray(coded) > 0, 255.0, 0.0)
    for i in flip_idx:
        soft[..., i] = 255.0 - soft[..., i]
    return soft


def test_conv_encode_known_rate():
    bits = jnp.asarray(np.zeros(10, np.uint8))
    coded = np.asarray(conv_encode(CCSDS_K7, bits))
    assert coded.shape == (20,)
    assert (coded == 0).all()  # all-zero input -> all-zero output


def test_viterbi_clean_roundtrip(rng):
    bits = rng.integers(0, 2, 120).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    soft = bits_to_soft(coded).reshape(-1, 2)
    dec, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    dec = np.asarray(dec)
    # free-running decode: allow the trailing K-1 bits to be unreliable
    np.testing.assert_array_equal(dec[:-6], bits[:-6])


def test_viterbi_corrects_errors(rng):
    bits = rng.integers(0, 2, 200).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    # flip 8 well-separated coded bits (within correction capability)
    flips = [10, 60, 110, 170, 230, 290, 340, 380]
    soft = bits_to_soft(coded, flips).reshape(-1, 2)
    dec, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    np.testing.assert_array_equal(np.asarray(dec)[:-6], bits[:-6])


def test_viterbi_with_erasures(rng):
    bits = rng.integers(0, 2, 150).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    soft = bits_to_soft(coded)
    soft[30:34] = 128.0  # erase 4 consecutive coded bits
    dec, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft.reshape(-1, 2)))
    np.testing.assert_array_equal(np.asarray(dec)[:-6], bits[:-6])


def test_viterbi_batched(rng):
    bits = rng.integers(0, 2, (3, 100)).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    soft = bits_to_soft(coded).reshape(3, -1, 2)
    dec, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    np.testing.assert_array_equal(np.asarray(dec)[:, :-6], bits[:, :-6])


def test_viterbi_awgn_ber(rng):
    """Soft-decision decode at moderate SNR: BER should be far below raw."""
    n = 2000
    bits = rng.integers(0, 2, n).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits))).astype(np.float64)
    tx = 2.0 * coded - 1.0
    snr_db = 3.0
    sigma = 10 ** (-snr_db / 20.0)
    rx = tx + sigma * rng.standard_normal(tx.shape)
    soft = np.clip(rx * 100.0 + 128.0, 0, 255).reshape(-1, 2)
    dec, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    ber = np.mean(np.asarray(dec)[:-6] != bits[:-6])
    raw_ber = np.mean((rx > 0).astype(np.uint8) != coded)
    assert ber < 0.01, f"decoded BER {ber} vs raw {raw_ber}"


def test_scrambler_descrambler_roundtrip(rng):
    bits = jnp.asarray(rng.integers(0, 2, 500).astype(np.uint8))
    s = Scrambler(0x8A, 0x7F, 7)
    d = Descrambler(0x8A, 0x7F, 7)
    _, scrambled = s(s.init_state(), bits)
    _, recovered = d(d.init_state(), scrambled)
    np.testing.assert_array_equal(np.asarray(recovered), np.asarray(bits))


def test_descrambler_self_synchronizes(rng):
    """Descrambler with wrong seed recovers after `length` bits."""
    bits = jnp.asarray(rng.integers(0, 2, 300).astype(np.uint8))
    s = Scrambler(0x8A, 0x7F, 7)
    d = Descrambler(0x8A, 0x00, 7)  # wrong seed
    _, scrambled = s(s.init_state(), bits)
    _, recovered = d(d.init_state(), scrambled)
    np.testing.assert_array_equal(np.asarray(recovered)[7:], np.asarray(bits)[7:])


def test_scrambler_block_invariance(rng):
    bits = rng.integers(0, 2, 400).astype(np.uint8)
    s = Scrambler()
    full = np.asarray(s.one_shot(jnp.asarray(bits)))
    chunks = run_chunked(s, bits, 8)
    np.testing.assert_array_equal(full, chunks)
    d = Descrambler()
    fulld = np.asarray(d.one_shot(jnp.asarray(full)))
    chunksd = run_chunked(d, full, 5)
    np.testing.assert_array_equal(fulld, chunksd)


def test_scrambler_changes_stream(rng):
    """Scrambling must alter the stream (and roundtrip on zeros works)."""
    bits = rng.integers(0, 2, 1000).astype(np.uint8)
    s = Scrambler()
    d = Descrambler()
    _, y = s(s.init_state(), jnp.asarray(bits))
    assert np.mean(np.asarray(y) != bits) > 0.2
    zeros = jnp.asarray(np.zeros(200, np.uint8))
    _, yz = s(s.init_state(), zeros)
    _, rz = d(d.init_state(), yz)
    np.testing.assert_array_equal(np.asarray(rz), np.asarray(zeros))


def test_crc32_known_value():
    import zlib
    data = b"123456789"
    assert crc32(data) == zlib.crc32(data)
    assert crc32(b"") == 0


def test_crc16_ccitt_known_value():
    # CRC-16/CCITT-FALSE check value for "123456789" is 0x29B1
    assert crc16_ccitt(b"123456789") == 0x29B1


def test_crc16_m17_known_values():
    # From the M17 spec CRC test vectors (poly 0x5935, init 0xFFFF):
    assert crc16_m17(b"") == 0xFFFF
    assert crc16_m17(b"A") == 0x206E
    assert crc16_m17(b"123456789") == 0x772B


def test_crc8():
    # CRC-8 (poly 0x07, init 0) check value for "123456789" is 0xF4
    assert crc8(b"123456789") == 0xF4


def test_crc9_residue():
    # appending the 9 CRC bits should give zero remainder
    rng = np.random.default_rng(1)
    bits = rng.integers(0, 2, 96).astype(np.uint8)
    c = crc9_dmr(bits)
    crc_bits = [(c >> i) & 1 for i in range(8, -1, -1)]
    assert crc9_dmr(np.concatenate([bits, crc_bits])) == 0


def test_depuncture():
    soft = jnp.asarray(np.arange(6, dtype=np.float32))
    out = np.asarray(depuncture(soft, [1, 1, 0, 1], n=2))
    assert out.shape == (4, 2)
    flat = out.reshape(-1)
    assert flat[2] == 128.0 and flat[6] == 128.0
    assert flat[0] == 0.0 and flat[1] == 1.0 and flat[3] == 2.0
    assert flat[4] == 3.0 and flat[5] == 4.0 and flat[7] == 5.0
