"""PSK digital chains: BPSK and DQPSK.

BPSK mirrors reference src/gr/gr_demod_bpsk.cpp:33-105 (1 Msps -> 1/50 ->
20 ksps; FLL band-edge(sps, 0.35, 32, 8pi/100) -> RRC shaping -> AGC2 ->
M&M clock recovery -> Costas(2pi/200, order 2) -> real -> x64+128 soft ->
dual delay-diversity CCSDS decode) and gr_mod_bpsk.cpp (+/-1 symbols, RRC
interp, x0.6).

DQPSK mirrors gr_demod_qpsk.cpp:33-159 (resampler -> [FLL] -> RRC -> AGC2
-> Costas PLL (order 4) -> symbol_sync_cc (M&M) -> Costas -> diff_phasor ->
rotate e^{-i3pi/4} -> interleaved I/Q soft x48+128 -> CCSDS tail) and
gr_mod_qpsk.cpp (Gray map -> differential phase encoding -> QPSK points ->
RRC). The differential phase mapping here is derived so that the RX
diff-phasor + rotate + sign-slicing is its exact inverse: dibit v = 2*b0+b1
-> phase-increment index k = [0,3,1,2][v], symbol = exp(i(pi/4 + q*pi/2))
with q accumulated mod 4.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.agc import Agc2
from qradiolink_tpu.ops.spectrum import rssi_dbm
from qradiolink_tpu.sync.costas import CostasLoop
from qradiolink_tpu.sync.fll import FllBandEdge
from qradiolink_tpu.sync.symbol_sync import SymbolSync
from qradiolink_tpu.chains.digital_common import (
    TxFecHead, RxFecTail, bytes_to_bits, pack_dibits)


class BpskDemod(Block):
    SAMP_RATE = 1_000_000
    TARGET_RATE = 20_000

    def __init__(self, symbol_rate: int = 2000, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.sps = fs // symbol_rate
        self.resamp = RationalResampler(
            1, 50, taps=firdes.low_pass(1.0, self.SAMP_RATE, fs / 2, fs / 2,
                                        firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.fll = FllBandEdge(self.sps, 0.35, 32, 8 * np.pi / 100, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(float(self.sps), float(self.sps), 1.0,
                                      0.35, 15 * self.sps + 1), lead_shape=ls)
        self.agc = Agc2(1e-1, 1e-1, reference=1.0, lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.05,
                                      gain_omega=2.5e-5,
                                      omega_limit=0.001, lead_shape=ls)
        self.costas = CostasLoop(2 * np.pi / 200.0, order=2, lead_shape=ls)
        self.fec_tail = RxFecTail(lead_shape=(2,) + ls)
        self.blocks = [self.resamp, self.fll, self.shaping, self.agc,
                       self.symbol_sync, self.costas, self.fec_tail]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        rssi = rssi_dbm(x)
        x = seq(self.fll, x)
        x = seq(self.shaping, x)
        x = seq(self.agc, x)
        syms = seq(self.symbol_sync, x)
        syms = seq(self.costas, syms)
        soft = jnp.clip(syms.real * 64.0 + 128.0, 0.0, 255.0)
        delayed = jnp.concatenate(
            [jnp.full(soft.shape[:-1] + (1,), 128.0), soft[..., :-1]], axis=-1)
        both = jnp.stack([soft, delayed], axis=0)
        bits2 = seq(self.fec_tail, both)
        return seq.states(), {"bits": bits2[0], "bits_alt": bits2[1],
                              "constellation": syms, "rssi": rssi}


class BpskMod(Block):
    SAMP_RATE = 1_000_000

    def __init__(self, symbol_rate: int = 2000, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.fec_head = TxFecHead(lead_shape=ls)
        sps = 10  # shape at 10 samp/sym then interpolate to device rate
        self.sps = sps
        self.shaper = RationalResampler(
            sps, 1, taps=firdes.root_raised_cosine(float(sps), float(sps),
                                                   1.0, 0.35, 11 * sps + 1),
            lead_shape=ls)
        up = self.SAMP_RATE // (symbol_rate * sps)
        self.up = RationalResampler(up, 1, lead_shape=ls)
        self.blocks = [self.fec_head, self.shaper, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, data_bytes):
        seq = Sequencer(state)
        bits = bytes_to_bits(data_bytes)
        coded = seq(self.fec_head, bits)
        syms = (2.0 * coded.astype(jnp.float32) - 1.0).astype(jnp.complex64)
        x = seq(self.shaper, syms) * 0.6
        x = seq(self.up, x)
        return seq.states(), {"iq": x}


_DQPSK_INC = np.array([0, 3, 1, 2], np.int32)  # dibit value -> phase steps


class QpskDemod(Block):
    """DQPSK demod (QPSK_2K/20K config: 40 ksps target, sps=4 default)."""
    SAMP_RATE = 1_000_000

    def __init__(self, symbol_rate: int = 10_000, target_rate: int = 40_000,
                 lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.sps = target_rate // symbol_rate
        decim = self.SAMP_RATE // target_rate
        self.resamp = RationalResampler(
            1, decim, taps=firdes.low_pass(1.0, self.SAMP_RATE,
                                           target_rate / 2, target_rate / 10,
                                           firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.fll = FllBandEdge(self.sps, 0.35, 32, 2 * np.pi / 100, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(float(self.sps), float(self.sps), 1.0,
                                      0.35, 11 * self.sps + 1), lead_shape=ls)
        self.agc = Agc2(1.0, 1e-1, reference=1.0, lead_shape=ls)
        self.costas_pll = CostasLoop(np.pi / 200.0 / self.sps, order=4,
                                     lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps,
                                      omega_limit=200.0 / symbol_rate,
                                      lead_shape=ls)
        self.costas = CostasLoop(np.pi / 200.0, order=4, lead_shape=ls)
        self.fec_tail = RxFecTail(lead_shape=ls)
        self.lead_shape = ls
        self.blocks = [self.resamp, self.fll, self.shaping, self.agc,
                       self.costas_pll, self.symbol_sync, self.costas,
                       self.fec_tail]

    def init_state(self):
        prev = jnp.ones(self.lead_shape + (1,), jnp.complex64)
        return init_states(self.blocks) + (prev,)

    def __call__(self, state, iq):
        *bs, prev_sym = state
        seq = Sequencer(bs)
        x = seq(self.resamp, iq)
        rssi = rssi_dbm(x)
        x = seq(self.fll, x)
        x = seq(self.shaping, x)
        x = seq(self.agc, x)
        x = seq(self.costas_pll, x)
        syms = seq(self.symbol_sync, x)
        syms = seq(self.costas, syms)
        # differential phase decode
        sc = jnp.concatenate([prev_sym, syms], axis=-1)
        z = sc[..., 1:] * jnp.conj(sc[..., :-1])
        w = z * np.exp(-3j * np.pi / 4)
        soft = jnp.stack([w.real, w.imag], axis=-1)
        soft = soft.reshape(*w.shape[:-1], w.shape[-1] * 2)
        soft = jnp.clip(soft * 48.0 + 128.0, 0.0, 255.0)
        bits = seq(self.fec_tail, soft)
        return seq.states() + (sc[..., -1:],), {
            "bits": bits, "constellation": w, "rssi": rssi}


class QpskMod(Block):
    SAMP_RATE = 1_000_000

    def __init__(self, symbol_rate: int = 10_000, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.fec_head = TxFecHead(lead_shape=ls)
        sps = 4
        self.sps = sps
        self.shaper = RationalResampler(
            sps, 1, taps=firdes.root_raised_cosine(float(sps), float(sps),
                                                   1.0, 0.35, 11 * sps + 1),
            lead_shape=ls)
        up = self.SAMP_RATE // (symbol_rate * sps)
        self.up = RationalResampler(up, 1, lead_shape=ls)
        self.lead_shape = ls
        self.blocks = [self.fec_head, self.shaper, self.up]

    def init_state(self):
        return init_states(self.blocks) + (jnp.zeros(self.lead_shape,
                                                     jnp.int32),)

    def __call__(self, state, data_bytes):
        *bs, q0 = state
        seq = Sequencer(bs)
        bits = bytes_to_bits(data_bytes)
        coded = seq(self.fec_head, bits)
        v = pack_dibits(coded)
        inc = jnp.asarray(_DQPSK_INC)[v]
        q = jnp.mod(q0[..., None] + jnp.cumsum(inc, axis=-1), 4)
        ph = (np.pi / 4) + q.astype(jnp.float32) * (np.pi / 2)
        syms = jnp.exp(1j * ph).astype(jnp.complex64)
        x = seq(self.shaper, syms) * 0.6
        x = seq(self.up, x)
        return seq.states() + (q[..., -1],), {"iq": x}
