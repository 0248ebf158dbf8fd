"""FreeDV chains: SSB-style passband transport for the FreeDV modem.

Mirrors reference src/gr/gr_demod_freedv.cpp:30-82 and
gr_mod_freedv.cpp:28-90: FreeDV is an HF digital-voice waveform whose
modem (OFDM/FSK, inside libcodec2) runs at an 8 kHz real passband; the
radio chain's job is SSB up/down conversion of that passband:

  RX: 1 Msps IQ -> rational resampler 1/125 -> complex band-pass
      (USB [low_cutoff, fw] or LSB mirrored) -> complex->real ->
      AGC2(1e-1, 1e-3, 0.5) -> band-pass 200..3500 -> x0.1 ->
      passband floats for freedv_rx
  TX: freedv_tx passband floats -> band-pass complex filter ->
      feedforward AGC (512-window envelope normalize) -> interpolating
      resampler x125 -> x0.98 -> 1 Msps IQ

The vocoder/modem halves (audio/freedv.py FreeDV bridge) stay on the
host — they are the reference's gr-vocoder blocks, i.e. libcodec2 C
calls, not DSP to port. FreeDvTx/FreeDvRx below couple bridge + chain
into an audio<->IQ interface; all 8 reference variants
(1600/700C/700D/800XA x USB/LSB, src/modem_types.h) are expressible
via (mode, usb) arguments and registered in models/registry.py.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.agc import Agc2
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.spectrum import rssi_dbm

TARGET_RATE = 8_000


class FeedforwardAgc(Block):
    """Envelope normalizer (reference gr::analog::feedforward_agc_cc
    with nsamples=512): divides by the rolling block envelope so the
    modem waveform leaves at ~unit amplitude."""

    def __init__(self, window: int = 512, reference: float = 1.0,
                 lead_shape: tuple = ()):
        self.window = int(window)
        self.reference = float(reference)
        self.lead_shape = tuple(lead_shape)

    def init_state(self):
        return jnp.full(self.lead_shape, 1e-6, jnp.float32)

    def __call__(self, state, x):
        env = jnp.max(jnp.abs(x), axis=-1)
        m = jnp.maximum(env, 0.5 * state)
        y = x * (self.reference / jnp.maximum(m, 1e-6))[..., None]
        return m.astype(jnp.float32), y


class FreeDvDemod(Block):
    """FreeDV RX front: 1 Msps IQ -> 8 kHz passband floats."""
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float = 2500.0,
                 low_cutoff: float = 200.0, usb: bool = True,
                 lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.resamp = RationalResampler(
            1, 125, taps=firdes.low_pass(1.0, self.SAMP_RATE,
                                         TARGET_RATE / 2, TARGET_RATE / 2,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        lo, hi = (low_cutoff, filter_width) if usb \
            else (-filter_width, -low_cutoff)
        self.chan_filter = FirFilter(
            firdes.complex_band_pass(1.0, TARGET_RATE, lo, hi, 200.0,
                                     firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.agc = Agc2(1e-1, 1e-3, reference=0.5, lead_shape=ls)
        self.audio_filter = FirFilter(
            firdes.band_pass(1.0, TARGET_RATE, 200.0, 3500.0, 200.0,
                             firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.agc,
                       self.audio_filter]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        a = seq(self.agc, x.real)
        a = seq(self.audio_filter, a) * 0.1
        return seq.states(), {"passband": a, "rssi": rssi,
                              "constellation": x}


class FreeDvMod(Block):
    """FreeDV TX back: 8 kHz passband floats -> 1 Msps IQ."""
    SAMP_RATE = 1_000_000

    def __init__(self, filter_width: float = 2500.0,
                 low_cutoff: float = 200.0, usb: bool = True,
                 lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        lo, hi = (low_cutoff, filter_width) if usb \
            else (-filter_width, -low_cutoff)
        self.chan_filter = FirFilter(
            firdes.complex_band_pass(1.0, TARGET_RATE, lo, hi, 250.0,
                                     firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.agc = FeedforwardAgc(512, 1.0, lead_shape=ls)
        self.up = RationalResampler(
            125, 1, taps=firdes.low_pass(125.0, self.SAMP_RATE,
                                         filter_width, 1200.0),
            lead_shape=ls)
        self.blocks = [self.chan_filter, self.agc, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, passband):
        seq = Sequencer(state)
        x = seq(self.chan_filter, passband.astype(jnp.complex64))
        x = seq(self.agc, x)
        x = seq(self.up, x) * 0.98
        return seq.states(), {"iq": x}


class FreeDvTx:
    """Audio (8 kHz float) -> IQ: vocoder+modem on host, SSB chain on
    device (the reference's full gr_mod_freedv path incl. the 200-3500
    audio band-pass ahead of freedv_tx)."""

    def __init__(self, mode: str = "1600", usb: bool = True,
                 filter_width: float = 2500.0):
        from qradiolink_tpu.audio.freedv import FreeDV
        self.freedv = FreeDV(mode)
        self.audio_filter = FirFilter(
            firdes.band_pass(1.0, TARGET_RATE, 200.0, 3500.0, 350.0,
                             firdes.WIN_BLACKMAN_HARRIS))
        self._af_state = self.audio_filter.init_state()
        self.chain = FreeDvMod(usb=usb, filter_width=filter_width)
        self._state = self.chain.init_state()

    def process(self, audio: np.ndarray) -> np.ndarray:
        self._af_state, filt = self.audio_filter(
            self._af_state, jnp.asarray(audio, jnp.float32))
        pcm = np.clip(np.asarray(filt) * 32765.0, -32765,
                      32765).astype(np.int16)
        modem = self.freedv.tx(pcm)
        if modem.size == 0:
            return np.zeros(0, np.complex64)
        pb = modem.astype(np.float32) / 32765.0
        self._state, out = self.chain(self._state, jnp.asarray(pb))
        return np.asarray(out["iq"])


class FreeDvRx:
    """IQ -> decoded audio (8 kHz float)."""

    def __init__(self, mode: str = "1600", usb: bool = True,
                 filter_width: float = 2500.0):
        from qradiolink_tpu.audio.freedv import FreeDV
        self.freedv = FreeDV(mode)
        self.chain = FreeDvDemod(usb=usb, filter_width=filter_width)
        self._state = self.chain.init_state()

    def process(self, iq: np.ndarray) -> np.ndarray:
        self._state, out = self.chain(self._state, jnp.asarray(iq))
        pb = np.asarray(out["passband"])
        pcm = np.clip(pb * 32768.0, -32767, 32767).astype(np.int16)
        speech = self.freedv.rx(pcm)
        # x2 audio gain (gr_demod_freedv.cpp:66)
        return speech.astype(np.float32) / 32768.0 * 2.0

    @property
    def sync(self) -> bool:
        return self.freedv.sync
