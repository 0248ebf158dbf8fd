"""DSP primitive ops: filter design, filtering, resampling, mixing, demod math."""

from qradiolink_tpu.ops import firdes  # noqa: F401
from qradiolink_tpu.ops.fir import FirFilter, fir_filter, FftFirFilter  # noqa: F401
from qradiolink_tpu.ops.resample import RationalResampler  # noqa: F401
from qradiolink_tpu.ops.rotator import Rotator  # noqa: F401
from qradiolink_tpu.ops.analog import (  # noqa: F401
    QuadratureDemod,
    FrequencyMod,
    PhaseMod,
    Emphasis,
    DcBlocker,
    ComplexToMag,
    ComplexToReal,
)
from qradiolink_tpu.ops.iir import FirstOrderIir  # noqa: F401
from qradiolink_tpu.ops.agc import Agc2  # noqa: F401
from qradiolink_tpu.ops.squelch import PowerSquelch, CtcssSquelch  # noqa: F401
from qradiolink_tpu.ops.channelizer import PfbChannelizer, PfbSynthesizer  # noqa: F401
from qradiolink_tpu.ops.spectrum import SpectrumProbe, rssi_dbm  # noqa: F401
