"""DSSS BPSK chain (Barker-13 spreading) and CW keying.

DSSS mirrors reference src/gr/gr_demod_dsss.cpp:33-115 +
dsss_decoder_cc_impl.cc / gr_mod_dsss.cpp + dsss_encoder_bb_impl.cc:
each coded bit is spread by the 13-chip Barker code at 25 samples/chip
(208 chips/s at the 5.2 ksps target -> 16 coded bit/s over the air, the
"BPSK DSSS 8" beacon mode).

TPU-native despreader: the reference's dsss_decoder slides a matched
filter (the RRC-shaped spread waveform) over each 325-sample bit window
and keeps the max-magnitude correlation — a per-window timing search.
Here the matched filter runs once over the whole block (a plain FIR)
and an argmax over (n_bits, 325) window reshapes picks each bit's
correlation peak: identical math, fully batched, no sequential search.
Carrier phase is recovered by a Costas loop on the bit-rate peaks.

CW (reference gr_mod_base.cpp:948 set_cw_k + the _usb_cw SSB chain at
gr_mod_base.cpp:180): a keyed 600 Hz tone through the USB modulator,
with a 5 ms raised-cosine keying ramp standing in for the reference's
amplitude stepping (which clicks; ours doesn't).
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
from qradiolink_tpu.chains.digital_common import (
    TxFecHead, RxFecTail, bytes_to_bits)
from qradiolink_tpu.chains.ssb import SsbMod

BARKER_13 = np.array([1, 1, 1, 1, 1, 0, 0, 1, 1, 0, 1, 0, 1], np.int64)
CHIP_SPS = 25          # samples per chip at 5.2 ksps
IF_RATE = 5_200
BIT_SAMPLES = CHIP_SPS * 13   # 325 samples per coded bit


def _matched_taps() -> np.ndarray:
    """RRC-shaped spread waveform (dsss_decoder_cc_impl.cc:60-100):
    time-reversed code, zero-order hold x25, RRC(alpha=0.35) filtered."""
    levels = np.where(BARKER_13[::-1] == 0, -1.0, 1.0)
    zoh = np.repeat(levels, CHIP_SPS)
    rrc = firdes.root_raised_cosine(1.0, float(CHIP_SPS), 1.0, 0.35,
                                    11 * CHIP_SPS)
    return np.convolve(zoh, rrc).astype(np.float32)


class DsssBpskDemod(Block):
    """DSSS BPSK RX: 1 Msps IQ -> hard bits at 16 bit/s.

    Block length must be a multiple of 62_500 (one coded bit of input:
    1 Msps -> x1/50 -> x13/50 -> 325 samples/bit at 5.2 ksps).
    """
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float = 150.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.lead_shape = ls
        self.resamp = RationalResampler(
            1, 50, taps=firdes.low_pass(1.0, self.SAMP_RATE, 10_000.0,
                                        10_000.0, firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.resamp_if = RationalResampler(
            13, 50, taps=firdes.low_pass(1.0, 20_000, IF_RATE / 2,
                                         IF_RATE / 2,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.costas_freq = CostasLoop(np.pi / 200, 2, lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, IF_RATE, filter_width, 1200.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.agc = Agc2(attack_rate=1e-1, decay_rate=1e-1, reference=1.0,
                        lead_shape=ls)
        self.matched = FirFilter(_matched_taps(), lead_shape=ls)
        # 4 decode streams: {pairing, delayed-pairing} x {+, -} polarity —
        # BPSK carrier ambiguity resolved by whichever stream frames
        # (the reference leaves the same ambiguity to its Costas lock)
        self.fec_tail = RxFecTail(lead_shape=(4,) + ls)
        self.blocks = [self.resamp, self.resamp_if, self.costas_freq,
                       self.chan_filter, self.agc, self.matched,
                       self.fec_tail]

    def init_state(self):
        return (init_states(self.blocks),
                jnp.zeros(self.lead_shape, jnp.float32),
                jnp.zeros(self.lead_shape + (BIT_SAMPLES,), jnp.float32),
                jnp.full(self.lead_shape + (1,), 128.0, jnp.float32))

    def __call__(self, state, iq):
        blocks_state, phase_prev, fold_acc, last_soft = state
        seq = Sequencer(blocks_state)
        x = seq(self.resamp, iq)
        x = seq(self.resamp_if, x)
        x = seq(self.costas_freq, x)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        x = seq(self.agc, x)
        m = seq(self.matched, x)
        # feedforward despread timing: fold |correlation| modulo the bit
        # period and sample every bit at the dominant phase (replaces the
        # reference's per-window max search, dsss_decoder_cc_impl.cc:135-158).
        # The fold profile is exponentially accumulated across blocks so
        # the argmax stays stable even for blocks of only a few bits.
        n_bits = m.shape[-1] // BIT_SAMPLES
        w = m[..., : n_bits * BIT_SAMPLES].reshape(
            *m.shape[:-1], n_bits, BIT_SAMPLES)
        fold = jnp.sum(jnp.abs(w), axis=-2)               # (..., 325)
        fold_acc = 0.75 * fold_acc + fold
        p = jnp.argmax(fold_acc, axis=-1)                  # (...,)
        peaks = jnp.take_along_axis(
            w, p[..., None, None], axis=-1)[..., 0]        # (..., n_bits)
        peaks = peaks * (2.0 / BIT_SAMPLES)
        # feedforward M2 carrier phase (squaring estimator), kept
        # continuous with the previous block's estimate
        z = jnp.sum(peaks * peaks, axis=-1)
        ang = 0.5 * jnp.angle(z)
        d = jnp.mod(ang - phase_prev + np.pi / 2, np.pi) - np.pi / 2
        ang = phase_prev + d
        syms = peaks * jnp.exp(-1j * ang)[..., None]
        soft = jnp.clip(syms.real * 64.0 * BIT_SAMPLES / 2 + 128.0,
                        0.0, 255.0)
        delayed = jnp.concatenate([last_soft, soft[..., :-1]], axis=-1)
        last_soft = soft[..., -1:]
        both = jnp.stack([soft, delayed, 255.0 - soft, 255.0 - delayed],
                         axis=0)
        bits4 = seq(self.fec_tail, both)
        return (seq.states(), ang, fold_acc, last_soft), {
            "bits": bits4[0], "bits_alt": bits4[1],
            "bits_inv": bits4[2], "bits_alt_inv": bits4[3],
            "rssi": rssi, "symbols": syms}


class DsssBpskMod(Block):
    """DSSS BPSK TX: bytes -> spread chips -> RRC -> 1 Msps IQ."""
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float = 1700.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.fec_head = TxFecHead(lead_shape=ls)
        self.code = jnp.asarray(BARKER_13.astype(np.uint8))
        self.shaper = RationalResampler(
            CHIP_SPS, 1, taps=firdes.root_raised_cosine(
                float(CHIP_SPS), float(CHIP_SPS), 1.0, 0.35, 11 * CHIP_SPS),
            lead_shape=ls)
        self.post = FirFilter(
            firdes.low_pass(1.0, IF_RATE, filter_width, 1200.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.up_if = RationalResampler(
            50, 13, taps=firdes.low_pass(50.0, IF_RATE * 50, filter_width,
                                         filter_width * 5), lead_shape=ls)
        self.up_rf = RationalResampler(
            50, 1, taps=firdes.low_pass(50.0, self.SAMP_RATE, filter_width,
                                        filter_width * 5), lead_shape=ls)
        self.blocks = [self.fec_head, self.shaper, self.post,
                       self.up_if, self.up_rf]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, data_bytes):
        seq = Sequencer(state)
        bits = bytes_to_bits(data_bytes)
        coded = seq(self.fec_head, bits)
        # spread: chip = code XOR bit (dsss_encoder_bb_impl.cc:76-86)
        chips = jnp.bitwise_xor(self.code[None, :],
                                coded[..., :, None].astype(jnp.uint8))
        chips = chips.reshape(*coded.shape[:-1], coded.shape[-1] * 13)
        syms = 2.0 * chips.astype(jnp.float32) - 1.0
        x = seq(self.shaper, syms + 0j) * 0.65
        x = seq(self.post, x)
        x = seq(self.up_if, x)
        x = seq(self.up_rf, x)
        return seq.states(), {"iq": x}


class CwMod(Block):
    """CW TX: key envelope (8 kHz, 0/1) -> keyed 600 Hz tone -> USB.

    Mirrors the reference's ModemTypeCW600USB path (signal source with
    amplitude keying through the _usb_cw SSB modulator,
    gr_mod_base.cpp:180,466-468,948)."""
    SAMP_RATE = 1_000_000
    TONE_HZ = 600.0

    def __init__(self, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.ssb = SsbMod(usb=True, lead_shape=ls)
        # 5 ms keying ramp at 8 kHz (40 taps)
        ramp = np.hanning(80)[:40]
        self.key_filter = FirFilter((ramp / ramp.sum()).astype(np.float32),
                                    lead_shape=ls)
        self.blocks = [self.key_filter, self.ssb]
        self._phase = 0.0

    def init_state(self):
        return (self.key_filter.init_state(), self.ssb.init_state(),
                jnp.zeros((), jnp.float32))

    def __call__(self, state, key):
        kf_state, ssb_state, phase = state
        kf_state, env = self.key_filter(kf_state, key.astype(jnp.float32))
        t = jnp.arange(env.shape[-1], dtype=jnp.float32)
        w = 2 * np.pi * self.TONE_HZ / 8000.0
        tone = jnp.sin(phase + w * t) * env
        phase = jnp.mod(phase + w * env.shape[-1], 2 * np.pi)
        ssb_state, out = self.ssb(ssb_state, tone)
        return (kf_state, ssb_state, phase), out
