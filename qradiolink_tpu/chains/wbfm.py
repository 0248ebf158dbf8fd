"""WBFM broadcast RX (RX-only in the reference, src/gr/gr_demod_wbfm.cpp:30-73):
  1 Msps -> resample 1/5 -> 200 ksps -> channel LP -> power squelch ->
  quadrature demod (gain fs/(2*pi*fw)) -> de-emphasis -> resample 1/25 -> 8 k.
"""

from __future__ import annotations

import numpy as np

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.analog import QuadratureDemod, Emphasis
from qradiolink_tpu.ops.squelch import PowerSquelch
from qradiolink_tpu.ops.spectrum import rssi_dbm


class WbfmDemod(Block):
    SAMP_RATE = 1_000_000
    TARGET_RATE = 200_000
    AUDIO_RATE = 8_000

    def __init__(self, filter_width: float = 75_000.0,
                 squelch_db: float = -140.0, lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        fs = self.TARGET_RATE
        self.resamp = RationalResampler(1, 5, lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, fs, filter_width, filter_width * 0.2,
                            firdes.WIN_HAMMING), lead_shape=ls)
        self.squelch = PowerSquelch(squelch_db, alpha=0.01, lead_shape=ls)
        self.quad = QuadratureDemod(fs / (2 * np.pi * filter_width), lead_shape=ls)
        self.deemph = Emphasis(fs, tau=50e-6, mode="de", lead_shape=ls)
        self.audio_resamp = RationalResampler(1, 25, lead_shape=ls)
        self.audio_filter = FirFilter(
            firdes.low_pass(1.0, self.AUDIO_RATE, 3600.0, 500.0,
                            firdes.WIN_HAMMING), lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.squelch, self.quad,
                       self.deemph, self.audio_resamp, self.audio_filter]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        x = seq(self.squelch, x)
        x = seq(self.quad, x)
        x = seq(self.deemph, x)
        x = seq(self.audio_resamp, x).real
        x = seq(self.audio_filter, x)
        return seq.states(), {"audio": x, "rssi": rssi}
