"""Shared pieces of the digital chains.

Every digital mode in the reference shares one TX head and one RX tail
(SURVEY §2.2): TX = unpack bytes MSB-first -> multiplicative scrambler
(0x8A/0x7F/7) -> CCSDS K=7 R=1/2 conv encode; RX = soft bits in [0,255]
-> cc_decoder -> descrambler -> packed bits.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.fec.conv import CCSDS_K7, conv_encode, StreamingViterbi
from qradiolink_tpu.fec.conv_ff import TiledViterbi
from qradiolink_tpu.fec.scrambler import Scrambler, Descrambler


def bytes_to_bits(data: jnp.ndarray) -> jnp.ndarray:
    """uint8 bytes (..., N) -> bits (..., 8N), MSB first."""
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    bits = (data[..., None] >> shifts) & 1
    return bits.reshape(*data.shape[:-1], data.shape[-1] * 8).astype(jnp.uint8)


def bits_to_bytes(bits: jnp.ndarray) -> jnp.ndarray:
    """bits (..., 8N) -> uint8 bytes (..., N), MSB first."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 8, 8).astype(jnp.uint32)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.uint32))
    return jnp.sum(b * weights, axis=-1).astype(jnp.uint8)


def pack_dibits(bits: jnp.ndarray) -> jnp.ndarray:
    """bits (..., 2N) -> dibit values (..., N), first bit is MSB."""
    b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 2, 2).astype(jnp.int32)
    return b[..., 0] * 2 + b[..., 1]


class TxFecHead(Block):
    """bits -> scramble -> conv encode (coded bits, 2 per input bit)."""

    def __init__(self, lead_shape: tuple = ()):
        self.scrambler = Scrambler(lead_shape=lead_shape)
        self.code = CCSDS_K7
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        # scrambler register + conv encoder register (K-1 previous bits)
        return (self.scrambler.init_state(),
                jnp.zeros(self.lead_shape, jnp.uint32))

    def __call__(self, state, bits):
        sstate, enc_reg = state
        sstate, sbits = self.scrambler(sstate, bits)
        # feed the carried encoder register as init_state; track new one
        K = self.code.K
        # encoder register after this block: last K-1 scrambled bits
        coded = _conv_encode_with_reg(self.code, sbits, enc_reg)
        # new encoder register: last K-1 scrambled bits, newest at LSB
        rev = jnp.flip(sbits[..., -(K - 1):].astype(jnp.uint32), axis=-1)
        w = (jnp.uint32(1) << jnp.arange(K - 1, dtype=jnp.uint32))
        new_reg = jnp.sum(rev * w, axis=-1)
        return (sstate, new_reg), coded


def _conv_encode_with_reg(code, bits, reg):
    """conv_encode with a traced (per-stream) initial register value."""
    K = code.K
    T = bits.shape[-1]
    idx = jnp.arange(K - 1, dtype=jnp.uint32)
    hist = ((reg[..., None] >> idx) & 1).astype(bits.dtype)
    hist = jnp.flip(hist, axis=-1)  # oldest first
    bx = jnp.concatenate([jnp.broadcast_to(hist, bits.shape[:-1] + (K - 1,)),
                          bits], axis=-1)
    outs = []
    for p in code.polys:
        acc = jnp.zeros_like(bits)
        for j in range(K):
            if (p >> j) & 1:
                acc = acc ^ bx[..., K - 1 - j: K - 1 - j + T]
        outs.append(acc)
    return jnp.stack(outs, axis=-1).reshape(bits.shape[:-1] + (T * code.n,))


class RxFecTail(Block):
    """soft coded values (..., 2T) in [0,255] -> decoded+descrambled bits."""

    def __init__(self, lag: int = 64, lead_shape: tuple = ()):
        self.viterbi = StreamingViterbi(CCSDS_K7, lag=lag, lead_shape=lead_shape)
        self.descrambler = Descrambler(lead_shape=lead_shape)

    def init_state(self):
        return (self.viterbi.init_state(), self.descrambler.init_state())

    def __call__(self, state, soft):
        vstate, dstate = state
        pairs = soft.reshape(*soft.shape[:-1], soft.shape[-1] // 2, 2)
        vstate, bits = self.viterbi(vstate, pairs)
        dstate, out = self.descrambler(dstate, bits)
        return (vstate, dstate), out


class RxFecTailFF(Block):
    """Block-parallel RX FEC tail: tiled Viterbi + feedforward descrambler.

    Functionally equivalent to RxFecTail (same CCSDS code, same
    descrambler) but with no sequential scan: the TPU-native path for
    high-rate chains and the headline bench (see fec/conv_ff.py).
    Emits bits for this block's symbols with `overlap` symbols of decode
    delay absorbed into the tile context, so output length == T as with
    RxFecTail.
    """

    def __init__(self, chunk: int | None = None, overlap: int = 32,
                 lead_shape: tuple = ()):
        self.viterbi = TiledViterbi(CCSDS_K7, chunk=chunk, overlap=overlap,
                                    lead_shape=lead_shape)
        self.descrambler = Descrambler(lead_shape=lead_shape)

    def init_state(self):
        return (self.viterbi.init_state(), self.descrambler.init_state())

    def __call__(self, state, soft):
        vstate, dstate = state
        pairs = soft.reshape(*soft.shape[:-1], soft.shape[-1] // 2, 2)
        vstate, bits = self.viterbi(vstate, pairs)
        dstate, out = self.descrambler(dstate, bits)
        return (vstate, dstate), out
