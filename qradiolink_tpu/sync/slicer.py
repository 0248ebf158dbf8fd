"""Hard/soft decision slicers and the 4FSK filter-bank discriminator.

binary_slicer: gr::digital::binary_slicer_fb equivalent.
Fsk4Discriminator: the reference's custom gr_4fsk_discriminator block
(reference src/gr/gr_4fsk_discriminator.cpp:10-44): argmax over 4 parallel
band-filter magnitudes mapped to a QPSK-like constellation point
(+/-0.707 +/- 0.707j) — here a pure vectorized argmax+lookup.
fsk4_slice_soft: 4-level symbols -> interleaved soft dibits in [0, 255]
(the x128+128 soft-bit convention the reference feeds its FEC tail).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def binary_slicer(x):
    """float -> {0,1} bits: 1 when x >= 0."""
    return (x >= 0).astype(jnp.uint8)


# band index (ascending tone frequency) -> point, matching the
# reference's in1..in4 branch order and its literal constants
# (gr_4fsk_discriminator.cpp:30-38)
_FSK4_POINTS = np.array(
    [-0.707107 - 0.707107j, -0.707107 + 0.707107j,
     0.707107 + 0.707107j, 0.707107 - 0.707107j],
    dtype=np.complex64,
)


class Fsk4Discriminator:
    """(..., 4, T) branch magnitudes -> (..., T) constellation points.

    A branch wins only when STRICTLY greater than all others; ties emit
    0+0j exactly as the reference's if/else-if chain does
    (gr_4fsk_discriminator.cpp:30-40) — verified bit-exact against the
    compiled reference in tests/test_golden_parity.py."""

    def __init__(self):
        self.points = jnp.asarray(_FSK4_POINTS)

    def __call__(self, mags):
        maxv = jnp.max(mags, axis=-2, keepdims=True)
        n_at_max = jnp.sum((mags == maxv).astype(jnp.float32), axis=-2)
        idx = jnp.argmax(mags, axis=-2)
        strict = (n_at_max == 1.0).astype(jnp.float32)
        return self.points[idx] * strict


def fsk4_slice_soft(sym, levels=(-1.5, -0.5, 0.5, 1.5)):
    """4-level symbol stream -> 2 soft bytes per symbol (MSB-first dibits).

    Matches the reference convention of scaling symbols x128+128 into
    [0,255] uchar soft bits for the CCSDS decoder: each symbol contributes
    (high bit, low bit) soft values.
    """
    lv = jnp.asarray(np.asarray(levels, np.float32))
    # soft high bit: sign of symbol; soft low bit: |sym| vs 1.0 boundary
    hi = jnp.clip(sym / 1.5, -1.0, 1.0)
    lo = jnp.clip(jnp.abs(sym) - 1.0, -1.0, 1.0)
    soft = jnp.stack([hi, lo], axis=-1).reshape(*sym.shape[:-1], -1)
    return jnp.clip(soft * 128.0 + 128.0, 0.0, 255.0)


def psk_soft_bits(y, scale: float = 128.0):
    """Complex symbols -> interleaved I/Q soft bytes [0,255] (QPSK path)."""
    soft = jnp.stack([y.real, y.imag], axis=-1).reshape(*y.shape[:-1], -1)
    return jnp.clip(soft * scale + 128.0, 0.0, 255.0)
