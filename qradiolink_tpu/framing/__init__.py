"""Layer-1/Layer-2 framing and protocol stacks (host-side).

Mirrors the reference's split: device-side chains produce continuous bit
streams; sync hunting / frame assembly / dispatch happen in the control
plane (reference src/gr_modem.cpp:1019-1441, src/layer1framing.h,
src/layer2.{h,cpp}). Here the bit-serial shift-register hunt is replaced by
a vectorized sliding-word search over bit blocks.
"""

from qradiolink_tpu.framing.layer1 import (  # noqa: F401
    FrameType, Layer1Framer, Deframer, MODE_FRAME_CONFIG, FrameConfig,
)
from qradiolink_tpu.framing.layer2 import (  # noqa: F401
    build_layer2_frame, parse_layer2_frame, PageMessage,
)
