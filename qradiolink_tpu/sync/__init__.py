"""Carrier and timing recovery: Costas loops, FLL band-edge, symbol sync.

These are the sample-sequential feedback loops of the reference's digital
chains (gr::digital costas_loop_cc, fll_band_edge_cc, symbol_sync_cc/ff,
clock_recovery_mm). They run as lax.scan at the low post-decimation rates
(8-80 ksps) with state carried between blocks; channels batch via vmap.
"""

from qradiolink_tpu.sync.costas import CostasLoop  # noqa: F401
from qradiolink_tpu.sync.fll import FllBandEdge  # noqa: F401
from qradiolink_tpu.sync.symbol_sync import SymbolSync  # noqa: F401
from qradiolink_tpu.sync.slicer import (  # noqa: F401
    binary_slicer, Fsk4Discriminator, fsk4_slice_soft,
)
