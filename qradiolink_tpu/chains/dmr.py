"""DMR 4FSK modem chain (24 ksps, 4800 sym/s, sps=5, RRC alpha=0.2).

RX mirrors reference src/gr/gr_demod_dmr.cpp:32-107: 1 Msps -> rational
resampler 3/125 (5 kHz channel) -> quadrature demod (gain
fs/(pi/2 * Rs)) -> RRC(1.0, 24k, 4800, 0.2, 125 taps) symbol filter ->
symbol_sync_ff (M&M, 4-level constellation) -> x0.9 level control ->
dibits. The reference reaches dibits through phase_mod(pi/2) -> I/Q
slicers -> pack -> map{3,1,2,0} -> unpack; algebraically that reduces
to sign bit + magnitude bit, computed directly here (same reduction as
chains/m17.py). Port 3's raw symbol-filter tap (used by
gr_dmr_dmo_sink for float sync correlation) is the "soft" output.

TX mirrors src/gr/gr_mod_dmr.cpp:27-97: dibits -> map{2,3,1,0} ->
levels {-1.5..1.5} -> RRC interp x5 (alpha=0.2) -> x2/3 -> freq mod
(pi*Rs*0.85/24000) -> zero-idle burst gating -> x0.9 -> resampler
125/3 -> 1 Msps. The reference's `gr_zero_idle_bursts` zeroes samples
flagged by `zero_samples` stream tags (gr_zero_idle_bursts.cpp:27-84);
here TDMA gating is an explicit host-computed per-sample mask argument
(SURVEY §2.8: burst scheduling on host, sample-accurate gating as
masks), keeping the device kernel timing-free.

Burst framing/decoding (sync hunt, slot type, FEC) lives in
protocols/dmr.py; this chain carries raw 9600 bit/s dibits like the
reference (gr_dmr_sink consumes port 2 dibits).
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


class DmrDemod(Block):
    """DMR RX: 1 Msps IQ -> hard dibit bits at 9600 bit/s.

    Block length must be a multiple of 625 (decim 125, then 5 sps).
    Outputs: bits (2/symbol, sign bit first), symbols, soft (RRC-filtered
    FM discriminator at 24 ksps, the reference's port-3 DMO tap),
    constellation, rssi.
    """
    SAMP_RATE = 1_000_000
    TARGET_RATE = 24_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 5000.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.sps = fs // self.SYMBOL_RATE  # 5
        self.resamp = RationalResampler(
            3, 125, taps=firdes.low_pass(3.0, 3 * self.SAMP_RATE,
                                         filter_width, 2000.0,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        # quad gain fs/(pi/2 * Rs) (gr_demod_dmr.cpp:73)
        self.quad = QuadratureDemod(fs / (np.pi / 2 * self.SYMBOL_RATE),
                                    lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.0, fs, self.SYMBOL_RATE, 0.2,
                                      25 * self.sps), lead_shape=ls)
        # gains tuned for our direct M&M loop (swept on clean + 12 dB
        # loopback); deviation limit 0.06 per gr_demod_dmr.cpp:70
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.2869,
                                      gain_omega=0.005,
                                      decisions=_LEVELS,
                                      omega_limit=0.06, lead_shape=ls)
        self.blocks = [self.resamp, self.quad, self.shaping,
                       self.symbol_sync]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        rssi = rssi_dbm(x)
        x = seq(self.quad, x)
        soft = seq(self.shaping, x)
        syms = seq(self.symbol_sync, soft) * 0.9
        # dibit = sign bit then magnitude bit (reduction of the
        # phase_mod/slicer/map{3,1,2,0} tail, see module docstring)
        b_hi = (syms < 0).astype(jnp.uint8)
        b_lo = (jnp.abs(syms) > 0.9).astype(jnp.uint8)
        bits = jnp.stack([b_hi, b_lo], axis=-1)
        bits = bits.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        const_tap = jnp.exp(1j * (np.pi / 2) * syms).astype(jnp.complex64)
        return seq.states(), {"bits": bits, "symbols": syms, "soft": soft,
                              "constellation": const_tap, "rssi": rssi}


class DmrDemodFF(Block):
    """TPU-path DMR demod: feedforward timing instead of the M&M scan.

    Same front half as DmrDemod (1 Msps -> 3/125 resampler -> FM
    discriminator -> RRC), with the sequential symbol_sync replaced by
    the block-parallel Oerder&Meyr + Farrow FeedforwardSymbolSync
    (sync/feedforward.py) — the same substitution the 4FSK headline
    chain makes (Fsk4DemodFF), so hundreds of DMR carriers batch on one
    chip with no lax.scan. Block length must be a multiple of
    125 * n_sub * sps (2500 by default).
    """
    SAMP_RATE = 1_000_000
    TARGET_RATE = 24_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 5000.0, lead_shape: tuple = (),
                 n_sub: int = 4):
        from qradiolink_tpu.sync.feedforward import FeedforwardSymbolSync
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.sps = fs // self.SYMBOL_RATE  # 5
        self.resamp = RationalResampler(
            3, 125, taps=firdes.low_pass(3.0, 3 * self.SAMP_RATE,
                                         filter_width, 2000.0,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.quad = QuadratureDemod(fs / (np.pi / 2 * self.SYMBOL_RATE),
                                    lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.0, fs, self.SYMBOL_RATE, 0.2,
                                      25 * self.sps), lead_shape=ls)
        self.symbol_sync = FeedforwardSymbolSync(self.sps, n_sub=n_sub,
                                                 lead_shape=ls)
        self.blocks = [self.resamp, self.quad, self.shaping,
                       self.symbol_sync]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        rssi = rssi_dbm(x)
        x = seq(self.quad, x)
        soft = seq(self.shaping, x)
        syms = seq(self.symbol_sync, soft)
        syms = jnp.real(syms) * 0.9
        b_hi = (syms < 0).astype(jnp.uint8)
        b_lo = (jnp.abs(syms) > 0.9).astype(jnp.uint8)
        bits = jnp.stack([b_hi, b_lo], axis=-1)
        bits = bits.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        from qradiolink_tpu.core import IqPair
        ph = (np.pi / 2) * syms
        const_tap = IqPair(jnp.cos(ph), jnp.sin(ph))
        return seq.states(), {"bits": bits, "symbols": syms, "soft": soft,
                              "constellation": const_tap, "rssi": rssi}


class DmrMod(Block):
    """DMR TX: bits (2/symbol) -> 1 Msps IQ, optional TDMA burst mask.

    `mask` (same leading shape as the 24 ksps sample stream, i.e.
    bits//2*5 samples/block) zeroes idle-slot samples like the
    reference's zero_samples-tagged gating."""
    SAMP_RATE = 1_000_000
    SYMBOL_RATE = 4_800

    def __init__(self, filter_width: float = 5000.0, lead_shape: tuple = (),
                 pair: bool = False):
        ls = tuple(lead_shape)
        sps = 5
        self.sps = sps
        if_rate = 24_000
        self.shaper = RationalResampler(
            sps, 1, taps=firdes.root_raised_cosine(float(sps), float(if_rate),
                                                   float(self.SYMBOL_RATE),
                                                   0.2, 25 * sps),
            lead_shape=ls)
        # sensitivity pi*Rs*0.85/fs (gr_mod_dmr.cpp:70)
        self.fm = FrequencyMod(np.pi * self.SYMBOL_RATE * 0.85 / if_rate,
                               lead_shape=ls, pair_out=pair)
        self.up = RationalResampler(
            125, 3, taps=firdes.low_pass(125.0, 3 * self.SAMP_RATE,
                                         filter_width, 2000.0,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.levels = jnp.asarray(np.asarray(_LEVELS, np.float32))
        self.map = jnp.asarray(np.asarray((2, 3, 1, 0), np.int32))
        self.blocks = [self.shaper, self.fm, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, bits, mask=None):
        seq = Sequencer(state)
        b = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 2, 2)
        dibits = (b[..., 0].astype(jnp.int32) * 2
                  + b[..., 1].astype(jnp.int32))
        syms = self.levels[self.map[dibits]]
        x = seq(self.shaper, syms).real * (2.0 / 3.0)
        x = seq(self.fm, x)
        if mask is not None:
            x = x * mask
        x = seq(self.up, x) * 0.9
        return seq.states(), {"iq": x}
