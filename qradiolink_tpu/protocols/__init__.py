"""Standards-based digital voice protocol stacks (M17, DMR).

Frame-level FEC transforms are vectorized array ops over bit tensors;
per-transmission bookkeeping (LSF reassembly, slot state machines) is
host-side Python — mirroring the reference's split between GR blocks and
the gr_modem/DMRControl control plane (reference src/gr_modem.cpp:1019).
"""

from qradiolink_tpu.protocols import m17  # noqa: F401
