"""Channel coding: convolutional/Viterbi, scramblers, block codes, CRCs.

The reference's FEC tail (descrambler + CCSDS K=7 R=1/2 Viterbi) terminates
every digital chain (SURVEY §2.2 "common digital tail"); the DMR/M17 stacks
add Golay/Hamming/BPTC/RS/trellis block codes (reference src/MMDVM/,
src/M17/). Here they are array programs over uint8 bit tensors: the Viterbi
ACS recursion is a lax.scan over time with the 64-state axis vectorized,
block codes are syndrome-table lookups built at import time.
"""

from qradiolink_tpu.fec.conv import (  # noqa: F401
    ConvCode, CCSDS_K7, conv_encode, viterbi_decode,
)
from qradiolink_tpu.fec.scrambler import Scrambler, Descrambler  # noqa: F401
from qradiolink_tpu.fec import bptc, rs129, trellis34  # noqa: F401
from qradiolink_tpu.fec.crc import crc32, crc16_ccitt, crc16_m17, crc8, crc9_dmr  # noqa: F401
