"""NBFM voice chains (2.5 kHz / 5 kHz deviation).

RX mirrors reference src/gr/gr_demod_nbfm.cpp:31-79:
  1 Msps IQ -> polyphase resample 1/50 -> 20 ksps -> channel low-pass
  -> power squelch (threshold dB, alpha .01, ramp 320) -> quadrature demod
  (gain fs/(4*pi*fw)) -> audio resample 2/5 -> 8 ksps -> audio LP 3.5 kHz
  -> 50 us de-emphasis -> x2.0; optional CTCSS tone squelch insert
  (reference :97-128).
TX mirrors src/gr/gr_mod_nbfm.cpp:30-135:
  8 ksps audio -> audio band filter -> pre-emphasis -> resample 25/4 ->
  50 ksps -> frequency modulator (sensitivity 4*pi*fw/50k) -> LP ->
  interpolate 20x -> 1 Msps; optional CTCSS adds a 0.15-amplitude tone.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.analog import QuadratureDemod, FrequencyMod, Emphasis
from qradiolink_tpu.ops.squelch import PowerSquelch, CtcssSquelch
from qradiolink_tpu.ops.spectrum import rssi_dbm


class NbfmDemod(Block):
    SAMP_RATE = 1_000_000
    TARGET_RATE = 20_000
    AUDIO_RATE = 8_000

    def __init__(self, filter_width: float = 2500.0, squelch_db: float = -140.0,
                 ctcss_hz: float = 0.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.filter_width = filter_width
        fs = self.TARGET_RATE
        self.resamp = RationalResampler(1, 50, lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width * 0.25,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.squelch = PowerSquelch(squelch_db, alpha=0.01, ramp=320, lead_shape=ls)
        self.quad = QuadratureDemod(fs / (4 * np.pi * filter_width), lead_shape=ls)
        self.audio_resamp = RationalResampler(2, 5, lead_shape=ls)
        self.audio_filter = FirFilter(
            firdes.low_pass(1.0, self.AUDIO_RATE, 3500.0, 600.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.deemph = Emphasis(self.AUDIO_RATE, tau=50e-6, mode="de", lead_shape=ls)
        self.ctcss = (CtcssSquelch(self.AUDIO_RATE, ctcss_hz, window=400,
                                   lead_shape=ls)
                      if ctcss_hz > 0 else None)
        self.blocks = [self.resamp, self.chan_filter, self.squelch, self.quad,
                       self.audio_resamp, self.audio_filter, self.deemph]
        if self.ctcss is not None:
            self.blocks.append(self.ctcss)

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        x = seq(self.squelch, x)
        x = seq(self.quad, x)
        x = seq(self.audio_resamp, x).real
        x = seq(self.audio_filter, x)
        x = seq(self.deemph, x)
        if self.ctcss is not None:
            x = seq(self.ctcss, x)
        return seq.states(), {"audio": 2.0 * x, "rssi": rssi}


class NbfmMod(Block):
    SAMP_RATE = 1_000_000
    AUDIO_RATE = 8_000

    def __init__(self, filter_width: float = 2500.0, ctcss_hz: float = 0.0,
                 lead_shape: tuple = (), pair: bool = False):
        ls = tuple(lead_shape)
        self.audio_filter = FirFilter(
            firdes.low_pass(1.0, self.AUDIO_RATE, 3150.0, 300.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.preemph = Emphasis(self.AUDIO_RATE, tau=50e-6, mode="pre",
                                lead_shape=ls)
        self.up1 = RationalResampler(25, 4, lead_shape=ls)  # 8k -> 50k
        self.fm = FrequencyMod(4 * np.pi * filter_width / 50_000.0,
                               lead_shape=ls, pair_out=pair)
        self.post_filter = FirFilter(
            firdes.low_pass(1.0, 50_000.0, filter_width * 2.0,
                            filter_width, firdes.WIN_HAMMING), lead_shape=ls)
        self.up2 = RationalResampler(20, 1, lead_shape=ls)  # 50k -> 1M
        self.ctcss_hz = float(ctcss_hz)
        self.lead_shape = ls
        self.blocks = [self.audio_filter, self.preemph, self.up1, self.fm,
                       self.post_filter, self.up2]

    def init_state(self):
        return init_states(self.blocks) + (jnp.zeros(self.lead_shape,
                                                     jnp.float32),)

    def __call__(self, state, audio):
        *bs, ctcss_phase = state
        seq = Sequencer(bs)
        x = seq(self.audio_filter, audio)
        x = seq(self.preemph, x)
        x = jnp.clip(x, -1.0, 1.0)
        if self.ctcss_hz > 0:
            t = jnp.arange(x.shape[-1], dtype=jnp.float32)
            w = 2 * np.pi * self.ctcss_hz / self.AUDIO_RATE
            tone = 0.15 * jnp.cos(ctcss_phase[..., None] + w * t)
            x = 0.85 * x + tone
            new_phase = jnp.mod(ctcss_phase + w * x.shape[-1], 2 * np.pi)
        else:
            new_phase = ctcss_phase
        x = seq(self.up1, x).real
        x = seq(self.fm, x)
        x = seq(self.post_filter, x)
        x = seq(self.up2, x)
        return seq.states() + (new_phase,), {"iq": x}
