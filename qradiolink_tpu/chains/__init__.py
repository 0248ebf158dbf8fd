"""Per-mode modem chains: each is a pure (state, block) -> (state, outputs)
function composed from ops/sync/fec blocks, compiled as one XLA program.

RX chains take complex baseband IQ at 1 Msps (the reference's internal
processing rate, reference src/gr/gr_demod_base.cpp:21) and produce audio
(8 ksps float) or bits plus probe taps. TX chains do the reverse.
"""

from qradiolink_tpu.chains.nbfm import NbfmDemod, NbfmMod  # noqa: F401
from qradiolink_tpu.chains.wbfm import WbfmDemod  # noqa: F401
from qradiolink_tpu.chains.am import AmDemod, AmMod  # noqa: F401
from qradiolink_tpu.chains.ssb import SsbDemod, SsbMod  # noqa: F401
from qradiolink_tpu.chains.fsk import (  # noqa: F401
    Fsk2Demod, Fsk2Mod, Fsk4Demod, Fsk4Mod, GmskDemod, GmskMod,
)
from qradiolink_tpu.chains.psk import (  # noqa: F401
    BpskDemod, BpskMod, QpskDemod, QpskMod,
)
from qradiolink_tpu.chains.channel import ChannelModel  # noqa: F401
