"""FSK-family digital chains: 4FSK, 2FSK, GMSK (FM-discriminator variants).

4FSK mirrors reference src/gr/gr_demod_4fsk.cpp (sps=5 config: 1 Msps ->
resample 1/50 -> 20 ksps, symbol rate 2 ksym/s, 10 samp/sym) and
gr_mod_4fsk.cpp; 2FSK mirrors gr_demod_2fsk.cpp / gr_mod_2fsk.cpp (FM
variant); GMSK mirrors gr_demod_gmsk.cpp / gr_mod_gmsk.cpp.

Common structure RX: resampler -> channel LP -> quadrature demod -> RRC (or
symbol LP) shaping -> M&M symbol sync -> soft bits -> streaming Viterbi ->
descrambler. The 2FSK/GMSK binary chains decode TWO bit-pairing phases in
parallel (delay-diversity, reference gr_demod_bpsk.cpp:97-103 pattern) by
batching the Viterbi over a leading axis of size 2.

TX: bytes -> unpack -> scramble -> conv encode -> (pack to symbols, Gray
map) -> pulse shape -> frequency modulator -> interpolate to 1 Msps.
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
from qradiolink_tpu.sync.feedforward import FeedforwardSymbolSync
from qradiolink_tpu.chains.digital_common import (
    TxFecHead, RxFecTail, RxFecTailFF, bytes_to_bits, pack_dibits)

_4FSK_LEVELS = (-1.5, -0.5, 0.5, 1.5)
_4FSK_MAP = (0, 1, 3, 2)  # Gray map, reference gr_mod_4fsk.cpp map

# RX variant table (reference gr_demod_4fsk.cpp:46-74 sps dispatch +
# gr_demod_base.cpp:211-225 per-mode filter widths):
#   name    -> (resamp L, M, target rate, symbol rate, default fw)
_4FSK_RX_VARIANTS = {
    "2KFM": (1, 50, 20_000, 2_000, 3000.0),    # sps=5, FM
    "2K": (1, 50, 20_000, 2_000, 4000.0),      # sps=5, filter bank
    "1KFM": (1, 100, 10_000, 1_000, 2000.0),   # sps=10
    "10KFM": (2, 25, 80_000, 10_000, 20000.0),  # sps=1 "INET"
    "96K": (1, 2, 500_000, 100_000, 125000.0),  # sps=2 IP modem
}
# TX variant table (gr_mod_4fsk.cpp:50-62 + gr_mod_base.cpp:163-177):
#   name -> (symbol rate, pulse sps, [interp factors to 1 Msps], fw)
_4FSK_TX_VARIANTS = {
    "2KFM": (2_000, 5, ((20, 1), (5, 1)), 3500.0),
    "2K": (2_000, 5, ((20, 1), (5, 1)), 4000.0),
    "1KFM": (1_000, 10, ((20, 1), (5, 1)), 2000.0),
    "10KFM": (10_000, 8, ((25, 2), (1, 1)), 20000.0),
    "96K": (100_000, 5, ((2, 1), (1, 1)), 125000.0),
}


class Fsk4Demod(Block):
    """4FSK FM-discriminator demod (reference gr_demod_4fsk.cpp fm=true).

    Default variant "2KFM": 1 Msps -> 20 ksps, 2000 sym/s (10 samp/sym),
    2 soft bits/symbol from phase_mod(pi/2) projection, CCSDS tail.
    Variants: 1KFM (10 ksps), 10KFM (80 ksps INET), 96K (500 ksps IP
    modem). Outputs: bits, constellation tap, rssi.
    """
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float | None = None,
                 lead_shape: tuple = (), variant: str = "2KFM"):
        ls = tuple(lead_shape)
        L, M, fs, sym_rate, default_fw = _4FSK_RX_VARIANTS[variant]
        if filter_width is None:
            filter_width = default_fw
        self.TARGET_RATE = fs
        self.SYMBOL_RATE = sym_rate
        self.sps = fs // sym_rate
        self.resamp = RationalResampler(
            L, M, taps=firdes.low_pass(float(L), L * self.SAMP_RATE,
                                       fs / 2, fs / 2,
                                       firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width / 2,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(self.sps / np.pi, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.5, fs, self.SYMBOL_RATE, 0.2,
                                      25 * self.sps + 1), lead_shape=ls)
        # gains derived from the reference's symbol_sync_ff(loop_bw
        # 2*pi/200, damping 1.0, ted_gain 0.2869) normalized-loop design
        # (gr_demod_4fsk.cpp:135): fast acquisition, bounded by omega_limit
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.085,
                                      gain_omega=0.0038,
                                      decisions=_4FSK_LEVELS,
                                      omega_limit=0.05, lead_shape=ls)
        self.fec_tail = RxFecTail(lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad, self.shaping,
                       self.symbol_sync, self.fec_tail]

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
        # phase_mod(pi/2) projection -> (sin, cos) soft pair per symbol
        # (the reference's FM-variant interleave order is [imag, real])
        ph = (np.pi / 2) * syms
        soft = jnp.stack([jnp.sin(ph), jnp.cos(ph)], axis=-1)
        soft = soft.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        soft = jnp.clip(soft * 128.0 + 128.0, 0.0, 255.0)
        from qradiolink_tpu.core import IqPair
        const_tap = IqPair(jnp.cos(ph), jnp.sin(ph))  # complex-free tap
        bits = seq(self.fec_tail, soft)
        return seq.states(), {"bits": bits, "constellation": const_tap,
                              "rssi": rssi, "symbols": syms}


class Fsk4DemodFF(Block):
    """TPU-path 4FSK demod: feedforward timing + tiled Viterbi.

    Same front half as Fsk4Demod (resampler -> channel LP -> quad demod
    -> RRC); the sequential symbol-sync and Viterbi scans are replaced by
    the block-parallel FeedforwardSymbolSync (Oerder&Meyr + Farrow, see
    sync/feedforward.py) and TiledViterbi (overlapped-tile ACS, see
    fec/conv_ff.py) so the whole chain is reshapes/elementwise/matmul —
    no lax.scan — and batches across channels AND time. This is the
    headline-bench path (BASELINE >=10x real-time/chip on the 4FSK chain;
    reference chain: src/gr/gr_demod_4fsk.cpp:32-205, sps=5 config).

    Block length must be a multiple of M * n_sub * sps (2000 for the
    default 2KFM variant).
    """
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float | None = None,
                 lead_shape: tuple = (), n_sub: int = 4,
                 variant: str = "2KFM", sync_window: int | None = None):
        ls = tuple(lead_shape)
        L, M, fs, sym_rate, default_fw = _4FSK_RX_VARIANTS[variant]
        if filter_width is None:
            filter_width = default_fw
        self.TARGET_RATE = fs
        self.SYMBOL_RATE = sym_rate
        self.sps = fs // sym_rate
        self.resamp = RationalResampler(
            L, M, taps=firdes.low_pass(float(L), L * self.SAMP_RATE,
                                       fs / 2, fs / 2,
                                       firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width / 2,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(self.sps / np.pi, lead_shape=ls)
        self.shaping = FirFilter(
            firdes.root_raised_cosine(1.5, fs, self.SYMBOL_RATE, 0.2,
                                      25 * self.sps + 1), lead_shape=ls)
        self.symbol_sync = FeedforwardSymbolSync(self.sps, n_sub=n_sub,
                                                 window=sync_window,
                                                 lead_shape=ls)
        self.fec_tail = RxFecTailFF(lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad, self.shaping,
                       self.symbol_sync, self.fec_tail]

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
        syms = syms.real
        ph = (np.pi / 2) * syms
        soft = jnp.stack([jnp.sin(ph), jnp.cos(ph)], axis=-1)
        soft = soft.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        soft = jnp.clip(soft * 128.0 + 128.0, 0.0, 255.0)
        from qradiolink_tpu.core import IqPair
        const_tap = IqPair(jnp.cos(ph), jnp.sin(ph))  # complex-free tap
        bits = seq(self.fec_tail, soft)
        return seq.states(), {"bits": bits, "constellation": const_tap,
                              "rssi": rssi, "symbols": syms}


class Fsk4Mod(Block):
    """4FSK TX (reference gr_mod_4fsk.cpp + gr_mod_base interpolation).

    Default "2KFM": 2 ksym/s -> RRC x5 -> FM -> x20 -> x5 -> 1 Msps
    (fm variant: spacing 1, amplif 0.9, pulse gain 2/3). Non-FM "2K"
    uses a zero-order hold (repeat) and tone spacing 2 with amplif 0.8
    (gr_mod_4fsk.cpp:64-70,106-112). Variants: 1KFM/10KFM/96K.
    """
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float | None = None,
                 lead_shape: tuple = (), variant: str = "2KFM",
                 pair: bool = False):
        ls = tuple(lead_shape)
        self._pair = bool(pair)
        sym_rate, sps, ups, default_fw = _4FSK_TX_VARIANTS[variant]
        if filter_width is None:
            filter_width = default_fw
        self.SYMBOL_RATE = sym_rate
        self.fm_variant = variant.endswith("FM") or variant == "96K"
        self.fec_head = TxFecHead(lead_shape=ls)
        self.sps = sps
        if self.fm_variant:
            self.shaper = RationalResampler(
                sps, 1, taps=firdes.root_raised_cosine(
                    float(sps), float(sps), 1.0, 0.2, 10 * sps + 1),
                lead_shape=ls)
            spacing, self.amplif = 1.0, 0.9
        else:
            # zero-order hold = repeat(sps) (gr_mod_4fsk.cpp:106-108);
            # unit taps: each output window sees exactly one input sample
            self.shaper = RationalResampler(
                sps, 1, taps=np.ones(sps, np.float32), lead_shape=ls)
            spacing, self.amplif = 2.0, 0.8
        self.fm = FrequencyMod(spacing * np.pi / sps, lead_shape=ls,
                               pair_out=self._pair)
        rate1 = sym_rate * sps
        (l1, m1), (l2, m2) = ups
        self.up1 = RationalResampler(
            l1, m1, taps=firdes.low_pass(float(l1), l1 * rate1,
                                         filter_width, filter_width,
                                         firdes.WIN_HAMMING),
            lead_shape=ls)
        self.up2 = RationalResampler(l2, m2, lead_shape=ls) \
            if (l2, m2) != (1, 1) else None
        self.levels = jnp.asarray(np.asarray(_4FSK_LEVELS, np.float32))
        self.map = jnp.asarray(np.asarray(_4FSK_MAP, np.int32))
        self.blocks = [self.fec_head, self.shaper, self.fm, self.up1] + \
            ([self.up2] if self.up2 is not None else [])

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, data_bytes):
        seq = Sequencer(state)
        bits = bytes_to_bits(data_bytes)
        coded = seq(self.fec_head, bits)
        dibits = pack_dibits(coded)
        syms = self.levels[self.map[dibits]]
        x = seq(self.shaper, syms).real
        if self.fm_variant:
            x = x * (2.0 / 3.0)
        x = seq(self.fm, x) * self.amplif
        x = seq(self.up1, x)
        if self.up2 is not None:
            x = seq(self.up2, x)
        return seq.states(), {"iq": x}


class Fsk4FbDemod(Block):
    """4FSK filter-bank demod — the reference's non-FM 4FSK2K variant
    (gr_demod_4fsk.cpp:110-198, fm=false branch).

    Instead of an FM discriminator, four complex band-pass filters
    isolate the four tones ([-fw,-fw+rs], [-fw+rs,0], [0,fw-rs],
    [fw-rs,fw]); per-sample tone-magnitude argmax maps to QPSK-corner
    points (gr_4fsk_discriminator.cpp:17-44); a symbol LP + complex M&M
    sync recovers symbols; I/Q signs are the soft bit pair. The four
    band-pass convolutions run as one batched FIR over a (4,) filter
    axis — the TPU formulation of the reference's four parallel
    fft_filter_ccc blocks.
    """
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float = 4000.0, lead_shape: tuple = (),
                 variant: str = "2K"):
        ls = tuple(lead_shape)
        L, M, fs, sym_rate, default_fw = _4FSK_RX_VARIANTS[variant]
        self.TARGET_RATE = fs
        self.SYMBOL_RATE = sym_rate
        self.sps = fs // sym_rate
        rs = float(sym_rate)
        fw = float(filter_width)
        bw = 2 * rs  # transition width (reference bw=4000 at rs=2000)
        self.resamp = RationalResampler(
            L, M, taps=firdes.low_pass(float(L), L * self.SAMP_RATE,
                                       fs / 2, fs / 2,
                                       firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, fw, fw / 2,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        # the 4 tone band-passes (XLA fuses the four convolutions; they
        # share the input stream)
        bands = [(-fw, -fw + rs), (-fw + rs, 0.0), (0.0, fw - rs),
                 (fw - rs, fw)]
        self.tone_bank = [
            FirFilter(firdes.complex_band_pass(
                1.0, fs, lo, hi, bw, firdes.WIN_BLACKMAN_HARRIS),
                lead_shape=ls)
            for lo, hi in bands]
        from qradiolink_tpu.sync.slicer import Fsk4Discriminator
        self.discriminator = Fsk4Discriminator()
        self.symbol_filter = FirFilter(
            firdes.low_pass(1.0, fs, rs, rs / 20,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.085,
                                      gain_omega=0.0038, decisions=None,
                                      omega_limit=0.05, lead_shape=ls)
        self.fec_tail = RxFecTail(lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, *self.tone_bank,
                       self.symbol_filter, self.symbol_sync, self.fec_tail]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        from qradiolink_tpu.core import iq_abs
        tones = [seq(f, x) for f in self.tone_bank]
        mags = jnp.stack([iq_abs(t) for t in tones], axis=-2)  # (..., 4, T)
        pts = self.discriminator(mags)                    # (..., T) complex
        pts = seq(self.symbol_filter, pts)
        syms = seq(self.symbol_sync, pts)
        # non-FM tail: I then Q slicer soft pair (interleave order 0,1 —
        # gr_demod_4fsk.cpp:188-191)
        soft = jnp.stack([syms.real, syms.imag], axis=-1)
        soft = soft.reshape(*syms.shape[:-1], syms.shape[-1] * 2)
        soft = jnp.clip(soft * 181.0 + 128.0, 0.0, 255.0)  # 0.707 -> full
        bits = seq(self.fec_tail, soft)
        return seq.states(), {"bits": bits, "constellation": syms,
                              "rssi": rssi, "symbols": syms}


class _BinaryFskDemodBase(Block):
    """Shared RX for 2FSK/GMSK FM-discriminator binary chains."""
    SAMP_RATE = 1_000_000

    def __init__(self, target_rate: int, symbol_rate: int, quad_gain: float,
                 shaping_taps, filter_width: float, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.sps = target_rate // symbol_rate
        from fractions import Fraction
        fr = Fraction(target_rate, self.SAMP_RATE)
        self.resamp = RationalResampler(fr.numerator, fr.denominator,
                                        lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, target_rate, filter_width, filter_width / 2,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(quad_gain, lead_shape=ls)
        self.shaping = FirFilter(shaping_taps, lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.085,
                                      gain_omega=0.0038,
                                      decisions=(-1.0, 1.0),
                                      omega_limit=0.05, lead_shape=ls)
        # delay-diversity: decode both coded-bit pairings in parallel
        self.fec_tail = RxFecTail(lead_shape=(2,) + ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad, self.shaping,
                       self.symbol_sync, self.fec_tail]

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
        soft = jnp.clip(syms * 128.0 + 128.0, 0.0, 255.0)
        # two pairing phases: [soft] and [soft delayed by 1]
        delayed = jnp.concatenate(
            [jnp.full(soft.shape[:-1] + (1,), 128.0), soft[..., :-1]], axis=-1)
        both = jnp.stack([soft, delayed], axis=0)
        bits2 = seq(self.fec_tail, both)
        return seq.states(), {"bits": bits2[0], "bits_alt": bits2[1],
                              "rssi": rssi, "symbols": syms}


class Fsk2Demod(_BinaryFskDemodBase):
    """2FSK FM variant (reference gr_demod_2fsk.cpp, sps=5 -> 1 ksym/s at
    20 ksps; RRC(alpha=0.2) shaping). target_rate=80_000 with
    symbol_rate=20_000 gives the sps=1 "10K INET" IP-modem config
    (gr_demod_2fsk.cpp:56-63)."""

    def __init__(self, symbol_rate: int = 1000, filter_width: float = 2500.0,
                 lead_shape: tuple = (), target_rate: int = 20_000):
        target = target_rate
        sps = target // symbol_rate
        super().__init__(
            target, symbol_rate, quad_gain=target / (2 * np.pi * filter_width),
            shaping_taps=firdes.root_raised_cosine(
                1.0, target, symbol_rate, 0.2, 15 * sps + 1),
            filter_width=filter_width, lead_shape=lead_shape)


class Fsk2FbDemod(Block):
    """2FSK filter-bank (non-FM) demod — reference gr_demod_2fsk.cpp
    fm=false branch: upper/lower complex band-passes -> magnitude ratio
    (upper/lower) -> rail [0,2] -> -1 -> symbol LP -> binary M&M sync ->
    delay-diversity CCSDS tail."""
    SAMP_RATE = 1_000_000

    def __init__(self, symbol_rate: int = 1000, filter_width: float = 2000.0,
                 lead_shape: tuple = (), target_rate: int = 20_000):
        ls = tuple(lead_shape)
        fs = target_rate
        fw = float(filter_width)
        self.sps = fs // symbol_rate
        from fractions import Fraction
        fr = Fraction(target_rate, self.SAMP_RATE)
        self.resamp = RationalResampler(fr.numerator, fr.denominator,
                                        lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, fw, fw, firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        # mark->[0,fw] (upper), space->[-fw,0] (lower); ratio slices the bit
        self.lower = FirFilter(
            firdes.complex_band_pass(1.0, fs, -fw, 0.0, fw,
                                     firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.upper = FirFilter(
            firdes.complex_band_pass(1.0, fs, 0.0, fw, fw,
                                     firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.symbol_filter = FirFilter(
            firdes.low_pass(1.0, fs, symbol_rate, symbol_rate,
                            firdes.WIN_HAMMING), lead_shape=ls)
        self.symbol_sync = SymbolSync(self.sps, gain_mu=0.085,
                                      gain_omega=0.0038,
                                      decisions=(-1.0, 1.0),
                                      omega_limit=0.05, lead_shape=ls)
        self.fec_tail = RxFecTail(lead_shape=(2,) + ls)
        self.blocks = [self.resamp, self.chan_filter, self.lower, self.upper,
                       self.symbol_filter, self.symbol_sync, self.fec_tail]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        from qradiolink_tpu.core import iq_abs
        lo = iq_abs(seq(self.lower, x))
        hi = iq_abs(seq(self.upper, x))
        # upper/lower ratio railed to [0,2] then centered (divide->rail->-1)
        r = jnp.clip(hi / (lo + 1e-9), 0.0, 2.0) - 1.0
        r = seq(self.symbol_filter, r)
        syms = seq(self.symbol_sync, r)
        soft = jnp.clip(syms * 128.0 + 128.0, 0.0, 255.0)
        delayed = jnp.concatenate(
            [jnp.full(soft.shape[:-1] + (1,), 128.0), soft[..., :-1]], axis=-1)
        both = jnp.stack([soft, delayed], axis=0)
        bits2 = seq(self.fec_tail, both)
        return seq.states(), {"bits": bits2[0], "bits_alt": bits2[1],
                              "rssi": rssi, "symbols": syms}


class GmskDemod(_BinaryFskDemodBase):
    """GMSK (reference gr_demod_gmsk.cpp): quad gain sps/(pi/2), symbol LP.

    target_rate=80_000 with symbol_rate=20_000 is the GMSK10K config
    (gr_demod_gmsk.cpp:53-60: 80 ksps, 4 samples/symbol)."""

    def __init__(self, symbol_rate: int = 1000, filter_width: float = 2500.0,
                 lead_shape: tuple = (), target_rate: int = 20_000):
        target = target_rate
        sps = target // symbol_rate
        super().__init__(
            target, symbol_rate, quad_gain=sps / (np.pi / 2),
            shaping_taps=firdes.low_pass(1.0, target, symbol_rate,
                                         symbol_rate / 2, firdes.WIN_HAMMING),
            filter_width=filter_width, lead_shape=lead_shape)


class _BinaryFskModBase(Block):
    SAMP_RATE = 1_000_000

    def __init__(self, symbol_rate: int, sensitivity_num: float,
                 shaper, filter_width: float, lead_shape: tuple = (),
                 pair: bool = False):
        ls = tuple(lead_shape)
        self.fec_head = TxFecHead(lead_shape=ls)
        self.shaper = shaper
        rate_after = symbol_rate * self.sps_total
        self.fm = FrequencyMod(sensitivity_num / self.sps_total, lead_shape=ls,
                               pair_out=pair)
        up = self.SAMP_RATE // rate_after
        self.up = RationalResampler(up, 1, lead_shape=ls)
        self.blocks = [self.fec_head, self.shaper, self.fm, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, data_bytes):
        seq = Sequencer(state)
        bits = bytes_to_bits(data_bytes)
        coded = seq(self.fec_head, bits)
        syms = 2.0 * coded.astype(jnp.float32) - 1.0
        x = seq(self.shaper, syms).real
        x = seq(self.fm, x) * 0.9
        x = seq(self.up, x)
        return seq.states(), {"iq": x}


class Fsk2Mod(_BinaryFskModBase):
    def __init__(self, symbol_rate: int = 1000, filter_width: float = 2500.0,
                 lead_shape: tuple = ()):
        sps = 5
        self.sps_total = sps
        shaper = RationalResampler(
            sps, 1, taps=firdes.root_raised_cosine(float(sps), float(sps),
                                                   1.0, 0.2, 25 * sps + 1),
            lead_shape=tuple(lead_shape))
        super().__init__(symbol_rate, np.pi / 2, shaper, filter_width,
                         lead_shape)


class GmskMod(_BinaryFskModBase):
    def __init__(self, symbol_rate: int = 1000, filter_width: float = 2500.0,
                 lead_shape: tuple = ()):
        sps = 5
        self.sps_total = sps
        # gaussian pulse shaping (BT=0.35) after x(sps) zero-order hold
        g = firdes.gaussian(1.0 / sps, sps, 0.35, 4 * sps)
        hold = np.ones(sps, np.float32)
        taps = np.convolve(np.repeat(g, 1), hold).astype(np.float32) * 1.0
        shaper = RationalResampler(sps, 1, taps=taps * sps,
                                   lead_shape=tuple(lead_shape))
        super().__init__(symbol_rate, np.pi / 2, shaper, filter_width,
                         lead_shape)
