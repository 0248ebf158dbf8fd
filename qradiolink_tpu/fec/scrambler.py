"""Multiplicative (self-synchronizing) scrambler / descrambler.

Every digital chain in the reference wraps the conv code in
digital.scrambler_bb/descrambler_bb with (mask 0x8A, seed 0x7F, len 7)
(SURVEY §2.2 "common digital tail"). Tap convention (mirroring the GR LFSR
where a mask bit i taps the output from `length - i + 1` steps ago):

  ages = { length - i + 1 : mask bit i set }
  scrambler:    y[n] = x[n] XOR (XOR_{d in ages} y[n-d])
  descrambler:  y[n] = x[n] XOR (XOR_{d in ages} x[n-d])

so descrambler(scrambler(x)) == x once the register flushes, and the
descrambler self-synchronizes within max(ages) bits of any bit slip.

The descrambler is feed-forward in the received bits, so it vectorizes to a
handful of shifted XORs. The scrambler has output feedback; it runs as a
lax.scan over bits (TX bit rates are low) — both carry their register as
streaming state. Seed bit j preloads the bit from j+1 steps before stream
start.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from qradiolink_tpu.core import Block


def _mask_ages(mask: int, length: int):
    ages = [length - i + 1 for i in range(length + 1) if (mask >> i) & 1]
    ages = sorted(d for d in ages if d >= 1)
    if not ages:
        raise ValueError("scrambler mask selects no taps")
    return ages


class Scrambler(Block):
    def __init__(self, mask: int = 0x8A, seed: int = 0x7F, length: int = 7,
                 lead_shape: tuple = ()):
        self.ages = _mask_ages(mask, length)
        self.depth = max(self.ages)
        self.seed = int(seed) & ((1 << self.depth) - 1)
        # feedback selects register bit d-1 (bit j = output from j+1 ago)
        self.fb_mask = 0
        for d in self.ages:
            self.fb_mask |= 1 << (d - 1)
        self.reg_mask = (1 << self.depth) - 1
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.full(self.lead_shape, self.seed, jnp.uint32)

    def __call__(self, state, bits):
        fb_mask = jnp.uint32(self.fb_mask)
        reg_mask = jnp.uint32(self.reg_mask)

        def step(reg, b):
            v = reg & fb_mask
            for s in (16, 8, 4, 2, 1):
                v = v ^ (v >> s)
            y = b.astype(jnp.uint8) ^ (v & 1).astype(jnp.uint8)
            reg = ((reg << 1) | y.astype(jnp.uint32)) & reg_mask
            return reg, y

        xs = jnp.moveaxis(bits, -1, 0)
        reg, ys = jax.lax.scan(step, state, xs)
        return reg, jnp.moveaxis(ys, 0, -1)


class Descrambler(Block):
    """Feed-forward inverse of Scrambler; vectorized shifted-XOR form."""

    def __init__(self, mask: int = 0x8A, seed: int = 0x7F, length: int = 7,
                 lead_shape: tuple = ()):
        self.ages = _mask_ages(mask, length)
        self.depth = max(self.ages)
        self.seed = int(seed) & ((1 << self.depth) - 1)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        # history of the last `depth` INPUT bits; hist[m] = x[m - depth],
        # i.e. x[-(j+1)] = seed bit j -> hist index depth-1-j
        D = self.depth
        hist = [(self.seed >> (D - 1 - m)) & 1 for m in range(D)]
        h = jnp.asarray(hist, jnp.uint8)
        return jnp.broadcast_to(h, self.lead_shape + (D,))

    def __call__(self, state, bits):
        T = bits.shape[-1]
        D = self.depth
        xb = jnp.concatenate([state, bits.astype(jnp.uint8)], axis=-1)
        y = bits.astype(jnp.uint8)
        for d in self.ages:
            y = y ^ xb[..., D - d : D - d + T]
        new_hist = xb[..., xb.shape[-1] - D:]
        return new_hist, y
