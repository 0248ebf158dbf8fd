"""BCH(63,16) encoder — the reference's P25-style NID protection.

Reference: /root/reference/src/MMDVM/BCH.cpp:86-139 (bch3.c-derived
systematic encoder: parity = x^47 * data(x) mod g(x) with the fixed
degree-47 generator). The reference's bit-serial LFSR runs once per
codeword; here the code is linear over GF(2), so the 16x47 parity
matrix is precomputed from unit-vector encodings and a batch of NIDs
encodes as ONE (…,16) x (16,47) matmul with a mod-2 — MXU-shaped and
vmappable. Verified bit-exact against the compiled reference
(tests/fixtures/bch_golden.json).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

# generator polynomial coefficients g[0..47] (BCH.cpp:88-89)
_G = np.array(
    [1, 1, 0, 0, 1, 1, 0, 1, 1, 0, 0, 1, 0, 0, 1, 1, 0, 0, 0, 0, 1, 0, 1, 1,
     1, 1, 0, 1, 1, 1, 0, 1, 0, 0, 1, 1, 1, 0, 1, 1, 0, 0, 1, 0, 1, 0, 1, 1],
    dtype=np.int64)

N, K = 63, 16
_NPAR = N - K  # 47


def _lfsr_parity(data16: np.ndarray) -> np.ndarray:
    """Bit-exact port of CBCH::encode(const int*, int*) (BCH.cpp:98-122)."""
    bb = np.zeros(_NPAR, np.int64)
    for i in range(K - 1, -1, -1):
        feedback = data16[i] ^ bb[_NPAR - 1]
        if feedback:
            for j in range(_NPAR - 1, 0, -1):
                bb[j] = bb[j - 1] ^ feedback if _G[j] else bb[j - 1]
            bb[0] = _G[0] & feedback
        else:
            bb[1:] = bb[:-1]
            bb[0] = 0
    return bb


@functools.lru_cache(maxsize=1)
def parity_matrix() -> np.ndarray:
    """P (16, 47): parity of unit data vectors; parity(d) = d @ P mod 2."""
    P = np.zeros((K, _NPAR), np.float32)
    for i in range(K):
        unit = np.zeros(K, np.int64)
        unit[i] = 1
        P[i] = _lfsr_parity(unit)
    return P


def bch_encode(data_bits) -> jnp.ndarray:
    """(..., 16) data bits -> (..., 63) systematic codewords.

    Output bit order matches CBCH::encode(unsigned char*): data bits
    first (positions 0..15), then parity bb[0..46] (positions 16..62)
    — note the reference writes bb[] in ASCENDING index order
    (BCH.cpp:135-138)."""
    d = jnp.asarray(data_bits).astype(jnp.float32)
    P = jnp.asarray(parity_matrix())
    par = jnp.mod(d @ P, 2.0)
    return jnp.concatenate([d, par], axis=-1).astype(jnp.uint8)


def encode_nid(nid: bytes | bytearray) -> bytes:
    """Byte-level equivalent of CBCH::encode(unsigned char*): reads the
    first 16 bits, writes the 47 parity bits at bit positions 16..62
    (bit 63 untouched). Host-side helper for packed NID buffers."""
    buf = np.unpackbits(np.frombuffer(bytes(nid), np.uint8))
    cw = np.asarray(bch_encode(buf[:K].astype(np.float32)))
    buf = buf.copy()
    buf[K:N] = cw[K:N]
    return np.packbits(buf).tobytes()
