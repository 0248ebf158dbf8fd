"""M17 4FSK modem chain (24 ksps, 4800 sym/s, sps=5, RRC alpha=0.5).

RX mirrors reference src/gr/gr_demod_m17.cpp:32-105: 1 Msps -> rational
resampler 3/125 -> 24 ksps channel LP (9 kHz) -> quadrature demod
(gain sps/pi) -> RRC(1.5, 24k, 4800, 0.5) -> symbol_sync_ff
(MOD-M&M, 4-level) -> dibit slicing. The reference reaches the dibit
values through phase_mod(pi/2) -> I/Q slicers -> pack -> map{3,1,2,0} ->
unpack; algebraically that chain reduces to: first bit = (symbol < 0),
second bit = (|symbol| > 1) — the M17 spec's sign/magnitude dibit map —
which is what we compute directly.

TX mirrors src/gr/gr_mod_m17.cpp:30-85: dibits -> map{2,3,1,0} -> levels
{-1.5,-0.5,0.5,1.5} -> RRC interp x5 (alpha=0.5) -> x2/3 -> freq mod
(pi/sps) -> 24k LP -> x0.9 -> resampler 125/3 -> 1 Msps.

Frame-level FEC (conv/puncture/interleave/Golay LICH) lives in
protocols/m17.py; this chain carries raw 9600 bit/s hard bits, exactly
like the reference (no CCSDS tail on M17).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.analog import QuadratureDemod, FrequencyMod
from qradiolink_tpu.ops.spectrum import rssi_dbm
from qradiolink_tpu.sync.symbol_sync import SymbolSync

_LEVELS = (-1.5, -0.5, 0.5, 1.5)


class M17Demod(Block):
    """M17 RX: 1 Msps IQ -> hard bits at 9600 bit/s.

    Block length must be a multiple of 625 (decim 125 and 5 sps).
    Outputs: bits (2 per symbol, sign bit first), symbols, constellation
    tap, rssi.
    """
    SAMP_RATE = 1_000_000
    TARGET_RATE = 24_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 9000.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.sps = fs // self.SYMBOL_RATE  # 5
        self.resamp = RationalResampler(
            3, 125, taps=firdes.low_pass(3.0, 3 * self.SAMP_RATE,
                                         fs / 2, fs / 2,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(self.sps / np.pi, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.5, fs, self.SYMBOL_RATE, 0.5,
                                      50 * self.sps + 1), lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.085,
                                      gain_omega=0.0038,
                                      decisions=_LEVELS,
                                      omega_limit=0.05, lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad,
                       self.shaping, self.symbol_sync]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        x = seq(self.quad, x)
        x = seq(self.shaping, x)
        syms = seq(self.symbol_sync, x)
        # dibit: sign bit then magnitude bit (M17 spec symbol map)
        b_hi = (syms < 0).astype(jnp.uint8)
        b_lo = (jnp.abs(syms) > 1.0).astype(jnp.uint8)
        bits = jnp.stack([b_hi, b_lo], axis=-1)
        bits = bits.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        const_tap = jnp.exp(1j * (np.pi / 2) * syms).astype(jnp.complex64)
        return seq.states(), {"bits": bits, "symbols": syms,
                              "constellation": const_tap, "rssi": rssi}


class M17DemodFF(Block):
    """TPU-path M17 demod: feedforward timing instead of the M&M scan
    (the Fsk4DemodFF/DmrDemodFF substitution applied to M17, for
    batching many reflector/repeater carriers on one chip). Block
    length must be a multiple of 125 * n_sub * sps (2500 by default).
    """
    SAMP_RATE = 1_000_000
    TARGET_RATE = 24_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 9000.0, lead_shape: tuple = (),
                 n_sub: int = 4):
        from qradiolink_tpu.sync.feedforward import FeedforwardSymbolSync
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.sps = fs // self.SYMBOL_RATE  # 5
        self.resamp = RationalResampler(
            3, 125, taps=firdes.low_pass(3.0, 3 * self.SAMP_RATE,
                                         fs / 2, fs / 2,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(self.sps / np.pi, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.5, fs, self.SYMBOL_RATE, 0.5,
                                      50 * self.sps + 1), lead_shape=ls)
        self.symbol_sync = FeedforwardSymbolSync(self.sps, n_sub=n_sub,
                                                 lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad,
                       self.shaping, self.symbol_sync]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        x = seq(self.quad, x)
        x = seq(self.shaping, x)
        syms = seq(self.symbol_sync, x)
        syms = jnp.real(syms)
        b_hi = (syms < 0).astype(jnp.uint8)
        b_lo = (jnp.abs(syms) > 1.0).astype(jnp.uint8)
        bits = jnp.stack([b_hi, b_lo], axis=-1)
        bits = bits.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        from qradiolink_tpu.core import IqPair
        ph = (np.pi / 2) * syms
        const_tap = IqPair(jnp.cos(ph), jnp.sin(ph))
        return seq.states(), {"bits": bits, "symbols": syms,
                              "constellation": const_tap, "rssi": rssi}


class M17Mod(Block):
    """M17 TX: bits (2 per symbol) -> 1 Msps IQ."""
    SAMP_RATE = 1_000_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 9000.0, lead_shape: tuple = (),
                 pair: bool = False):
        ls = tuple(lead_shape)
        sps = 5
        self.sps = sps
        if_rate = 24_000
        self.shaper = RationalResampler(
            sps, 1, taps=firdes.root_raised_cosine(float(sps), float(sps),
                                                   1.0, 0.5, 50 * sps + 1),
            lead_shape=ls)
        self.fm = FrequencyMod(np.pi / sps, lead_shape=ls, pair_out=pair)
        self.post_filter = FirFilter(
            firdes.low_pass(1.0, if_rate, filter_width, filter_width,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.up = RationalResampler(
            125, 3, taps=firdes.low_pass(125.0, 3 * self.SAMP_RATE,
                                         if_rate / 2, if_rate / 2,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        # TX dibit -> level index map (reference gr_mod_m17.cpp map{2,3,1,0})
        self.levels = jnp.asarray(np.asarray(_LEVELS, np.float32))
        self.map = jnp.asarray(np.asarray((2, 3, 1, 0), np.int32))
        self.blocks = [self.shaper, self.fm, self.post_filter, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, bits):
        seq = Sequencer(state)
        b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 2, 2)
        dibits = (b[..., 0].astype(jnp.int32) * 2
                  + b[..., 1].astype(jnp.int32))
        syms = self.levels[self.map[dibits]]
        x = seq(self.shaper, syms).real * (2.0 / 3.0)
        x = seq(self.fm, x)
        x = seq(self.post_filter, x) * 0.9
        x = seq(self.up, x)
        return seq.states(), {"iq": x}
