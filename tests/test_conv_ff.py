"""Tiled Viterbi must match the sequential decoder away from stream edges
and correct errors at the same SNR."""

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.fec.conv import (
    CCSDS_K7, conv_encode, viterbi_decode)
from qradiolink_tpu.fec.conv_ff import viterbi_decode_tiled, TiledViterbi


def make_soft(rng, n_bits, flip=0.0, noise=0.0):
    bits = rng.integers(0, 2, n_bits).astype(np.uint8)
    coded = np.asarray(conv_encode(CCSDS_K7, jnp.asarray(bits)))
    soft = coded.astype(np.float32) * 255.0
    if noise:
        soft = np.clip(soft + rng.normal(0, noise, soft.shape), 0, 255)
    if flip:
        mask = rng.random(soft.shape) < flip
        soft = np.where(mask, 255.0 - soft, soft)
    return bits, soft.reshape(-1, 2)


def test_tiled_matches_sequential_clean():
    rng = np.random.default_rng(0)
    bits, soft = make_soft(rng, 1024)
    ref, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    out = viterbi_decode_tiled(CCSDS_K7, jnp.asarray(soft), chunk=128,
                               overlap=32)
    np.testing.assert_array_equal(np.asarray(out)[32:-32],
                                  np.asarray(ref)[32:-32])
    np.testing.assert_array_equal(np.asarray(out)[32:-32], bits[32:-32])


def test_tiled_corrects_bit_flips():
    rng = np.random.default_rng(1)
    bits, soft = make_soft(rng, 2048, flip=0.05)
    out = np.asarray(viterbi_decode_tiled(CCSDS_K7, jnp.asarray(soft),
                                          chunk=128, overlap=32))
    ber = np.mean(out[64:-64] != bits[64:-64])
    assert ber < 0.001, f"BER {ber} at 5% channel flips"


def test_tiled_matches_sequential_noisy():
    rng = np.random.default_rng(2)
    bits, soft = make_soft(rng, 2048, noise=80.0)
    ref, _ = viterbi_decode(CCSDS_K7, jnp.asarray(soft))
    out = viterbi_decode_tiled(CCSDS_K7, jnp.asarray(soft), chunk=128,
                               overlap=32)
    agree = np.mean(np.asarray(out)[32:-32] == np.asarray(ref)[32:-32])
    assert agree > 0.999, f"agreement {agree}"


def test_tiled_batched():
    rng = np.random.default_rng(3)
    bits1, s1 = make_soft(rng, 512)
    bits2, s2 = make_soft(rng, 512, flip=0.03)
    soft = np.stack([s1, s2])
    out = np.asarray(viterbi_decode_tiled(CCSDS_K7, jnp.asarray(soft),
                                          chunk=128, overlap=32))
    assert out.shape == (2, 512)
    assert np.mean(out[0][32:-32] != bits1[32:-32]) == 0.0
    assert np.mean(out[1][64:-64] != bits2[64:-64]) < 0.01


def test_streaming_tiled_viterbi_blocks():
    rng = np.random.default_rng(4)
    bits, soft = make_soft(rng, 2048, flip=0.02)
    tv = TiledViterbi(chunk=128, overlap=32)
    st = tv.init_state()
    outs = []
    for part in np.split(soft, 4):
        st, b = tv(st, jnp.asarray(part))
        outs.append(np.asarray(b))
    out = np.concatenate(outs)
    assert out.shape == (2048,)
    ber = np.mean(out[64:-64] != bits[64:-64])
    assert ber < 0.005, f"streaming BER {ber}"
