"""MMDVM modem chains: single-carrier and 7-carrier multi (PFB).

The reference bridges MMDVMHost (external DMR/YSF/P25 stack) over
ZeroMQ with plain FM baseband at 24 ksps per carrier:

- single (reference src/gr/gr_demod_mmdvm.cpp:30-70): 250 ksps IQ ->
  rational resampler 12/125 -> rssi tag -> channel LP -> quadrature
  demod (gain fs/(2*pi*12.5k)) -> short samples to MMDVMHost. TX mirror
  gr_mod_mmdvm.cpp: FM mod 2*pi*12.5k/24k at 24k -> interp to device.
- multi (gr_demod_mmdvm_multi2.cpp:32-147): 250 ksps -> 10-branch PFB
  channelizer at 25 kHz spacing -> per-channel resamp 24/25 -> LP ->
  rssi tag -> FM demod -> 7-port sink; TX is the exact adjoint into a
  pfb_synthesizer (gr_mod_mmdvm_multi2.cpp:91-127) with a final
  1/num_channels level divide.

TPU-native formulation: the per-channel chains are ONE set of blocks
with lead_shape=(C,) — the channel axis is a batch axis (vmap-free
leading dim) that parallel/sharding.py can shard across devices
(SURVEY §2.8 "channel parallelism"). The PFB port remap (logical
channel i -> FFT bin [0,1,2,3,9,8,7][i], i.e. carriers centered around
DC) is a constant gather. TDMA burst gating stays host-side: masks per
SURVEY §2.8, consumed by the TX chain like chains/dmr.py.

Per-burst RSSI (the reference's rssi_tag_block stream tags feeding
gr_mmdvm_sink) is returned as a per-block, per-channel dB vector tap.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from qradiolink_tpu.core import Block, Sequencer, init_states
from qradiolink_tpu.ops import firdes
from qradiolink_tpu.ops.fir import FirFilter
from qradiolink_tpu.ops.resample import RationalResampler
from qradiolink_tpu.ops.analog import QuadratureDemod, FrequencyMod
from qradiolink_tpu.ops.channelizer import PfbChannelizer, PfbSynthesizer
from qradiolink_tpu.ops.spectrum import rssi_dbm, rssi_dbm_slots

DEVICE_RATE = 250_000       # MMDVM modes force 250 ksps (config_mmdvm.h:4)
TARGET_RATE = 24_000
CHANNEL_SPACING = 25_000
NUM_BRANCHES = 10
MAX_CHANNELS = 7
# every reference MMDVM chain defaults filter_width to 5 kHz
# (gr_demod_mmdvm.h:36, gr_mod_mmdvm.h:36, gr_demod_mmdvm_multi2.h:40)
FILTER_WIDTH = 5_000.0
# FM deviation constants: TX sensitivity is 2*pi*12.5k/24k everywhere
# (gr_mod_mmdvm.cpp:40, gr_mod_mmdvm_multi2.cpp:66); RX quad-demod gain
# uses 10 kHz single-carrier (gr_demod_mmdvm.cpp:41) and 12.5 kHz multi
# (gr_demod_mmdvm_multi2.cpp:55).
FM_DEV_TX = 12_500.0
FM_DEMOD_WIDTH_SINGLE = 10_000.0
FM_DEMOD_WIDTH_MULTI = 12_500.0

# logical channel i -> PFB bin (gr_demod_mmdvm_multi2.cpp:111-124:
# i<=3 -> bin i, i>3 -> bin 10-m); carriers sit at
# (bin<=4 ? bin : bin-10) * 25 kHz around the center frequency
PFB_PORT_MAP = np.array([0, 1, 2, 3, 9, 8, 7], np.int64)


class MmdvmDemod(Block):
    """Single-carrier MMDVM RX: 250 ksps IQ -> 24 ksps FM audio floats.

    Block length must be a multiple of 125. Outputs: audio (float,
    MMDVMHost-bound baseband), rssi (dB per block)."""

    def __init__(self, filter_width: float = FILTER_WIDTH,
                 lead_shape: tuple = ()):
        ls = tuple(lead_shape)
        self.resamp = RationalResampler(
            12, 125, taps=firdes.low_pass(12.0, 12 * DEVICE_RATE,
                                          filter_width, 2000.0,
                                          firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, TARGET_RATE, filter_width, 2000.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.quad = QuadratureDemod(
            TARGET_RATE / (2 * np.pi * FM_DEMOD_WIDTH_SINGLE), lead_shape=ls)
        self.blocks = [self.resamp, self.chan_filter, self.quad]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        seq = Sequencer(state)
        x = seq(self.resamp, iq)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        audio = seq(self.quad, x)
        return seq.states(), {"audio": audio, "rssi": rssi,
                              "rssi_slots": rssi_dbm_slots(x)}


class MmdvmMod(Block):
    """Single-carrier MMDVM TX: 24 ksps floats -> 250 ksps IQ.

    pair=True keeps the whole chain on core.IqPair f32 planes and
    returns iq as an IqPair (the complex-free TPU TX form; core.get_iq
    fetches it to the host)."""

    def __init__(self, filter_width: float = FILTER_WIDTH,
                 lead_shape: tuple = (), pair: bool = False):
        ls = tuple(lead_shape)
        self.fm = FrequencyMod(2 * np.pi * FM_DEV_TX / TARGET_RATE,
                               lead_shape=ls, pair_out=pair)
        self.post = FirFilter(
            firdes.low_pass(1.0, TARGET_RATE, filter_width, 2000.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=ls)
        self.up = RationalResampler(
            125, 12, taps=firdes.low_pass(125.0, 12 * DEVICE_RATE,
                                          filter_width, 2000.0,
                                          firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=ls)
        self.blocks = [self.fm, self.post, self.up]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, audio, mask=None):
        seq = Sequencer(state)
        x = seq(self.fm, audio)
        x = seq(self.post, x) * 0.8
        if mask is not None:
            x = x * mask
        x = seq(self.up, x)
        return seq.states(), {"iq": x}


class MmdvmMultiRx(Block):
    """Multi-carrier MMDVM RX: 250 ksps IQ -> (C, T*24/250) FM audio.

    10-branch PFB channelizer -> (C,)-batched [resamp 24/25 -> LP ->
    quad demod]. Block length must be a multiple of 250 (10 branches x
    25 for the 24/25 resampler).
    """

    def __init__(self, num_channels: int = MAX_CHANNELS,
                 filter_width: float = FILTER_WIDTH):
        assert 1 <= num_channels <= MAX_CHANNELS
        self.C = int(num_channels)
        cls = (self.C,)
        self.channelizer = PfbChannelizer(
            NUM_BRANCHES,
            taps=firdes.low_pass(1.0, DEVICE_RATE, filter_width, 2000.0,
                                 firdes.WIN_BLACKMAN_HARRIS))
        self.port_map = jnp.asarray(PFB_PORT_MAP[:self.C])
        self.resamp = RationalResampler(
            24, 25, taps=firdes.low_pass(1.0, 600_000, filter_width, 2000.0,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=cls)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, TARGET_RATE, filter_width, 2000.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=cls)
        self.quad = QuadratureDemod(
            TARGET_RATE / (2 * np.pi * FM_DEMOD_WIDTH_MULTI), lead_shape=cls)
        self.blocks = [self.channelizer, self.resamp, self.chan_filter,
                       self.quad]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, iq):
        from qradiolink_tpu.core import iq_take
        seq = Sequencer(state)
        chans = seq(self.channelizer, iq)       # (..., 10, T/10)
        chans = iq_take(chans, self.port_map, axis=-2)  # (..., C, T/10)
        x = seq(self.resamp, chans)             # (..., C, T*24/250)
        x = seq(self.chan_filter, x)
        rssi = rssi_dbm(x)
        audio = seq(self.quad, x)
        return seq.states(), {"audio": audio, "rssi": rssi,
                              "rssi_slots": rssi_dbm_slots(x)}


class MmdvmMultiTx(Block):
    """Multi-carrier MMDVM TX: (C, T24) FM audio -> 250 ksps IQ.

    (C,)-batched [FM mod -> LP -> x0.8 -> resamp 25/24] -> zero-idle
    mask -> PFB synthesizer -> /C level divide.
    """

    def __init__(self, num_channels: int = MAX_CHANNELS,
                 filter_width: float = FILTER_WIDTH, pair: bool = False):
        assert 1 <= num_channels <= MAX_CHANNELS
        self.C = int(num_channels)
        cls = (self.C,)
        self.fm = FrequencyMod(2 * np.pi * FM_DEV_TX / TARGET_RATE,
                               lead_shape=cls, pair_out=pair)
        self.chan_filter = FirFilter(
            firdes.low_pass(1.0, TARGET_RATE, filter_width, 2000.0,
                            firdes.WIN_BLACKMAN_HARRIS), lead_shape=cls)
        self.resamp = RationalResampler(
            25, 24, taps=firdes.low_pass(25.0, 600_000, filter_width, 2000.0,
                                         firdes.WIN_BLACKMAN_HARRIS),
            lead_shape=cls)
        self.synthesizer = PfbSynthesizer(
            NUM_BRANCHES,
            taps=firdes.low_pass(10.0, DEVICE_RATE, filter_width, 2000.0,
                                 firdes.WIN_BLACKMAN_HARRIS))
        self.port_map = np.asarray(PFB_PORT_MAP[:self.C])
        self.blocks = [self.fm, self.chan_filter, self.resamp,
                       self.synthesizer]

    def init_state(self):
        return init_states(self.blocks)

    def __call__(self, state, audio, mask=None):
        seq = Sequencer(state)
        x = seq(self.fm, audio)                 # (..., C, T24) complex
        x = seq(self.chan_filter, x) * 0.8
        x = seq(self.resamp, x)                 # (..., C, T24*25/24)
        if mask is not None:
            x = x * mask
        # scatter logical channels into their PFB bins
        from qradiolink_tpu.core import IqPair
        Tm = x.shape[-1]
        if isinstance(x, IqPair):
            zr = jnp.zeros(x.re.shape[:-2] + (NUM_BRANCHES, Tm), jnp.float32)
            bins = IqPair(zr.at[..., self.port_map, :].set(x.re),
                          zr.at[..., self.port_map, :].set(x.im))
        else:
            bins = jnp.zeros(x.shape[:-2] + (NUM_BRANCHES, Tm),
                             jnp.complex64)
            bins = bins.at[..., self.port_map, :].set(x)
        y = seq(self.synthesizer, bins)         # (..., Tm*10)
        y = y * (1.0 / self.C)
        return seq.states(), {"iq": y}
