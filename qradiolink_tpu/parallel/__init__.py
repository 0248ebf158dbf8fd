"""Device-mesh parallelism: channel sharding, time-block halo exchange.

The reference's concurrency axes (thread-per-block pipelines, PFB channel
parallelism, overlap-save block independence — SURVEY §2.8) map here to:
  * channel axis: vmapped chains sharded over a mesh axis (GSPMD partitions
    the embarrassingly-parallel channel dimension; no collectives needed)
  * time axis: shard_map over time blocks with K-1-sample halo exchange via
    ppermute for FIR/overlap-save stages (the "sequence parallel" axis)
  * host orchestration: the control loop feeds device-resident streaming
    state, mirroring the reference's radio-op thread around GR flowgraphs.
"""

from qradiolink_tpu.parallel.sharding import (  # noqa: F401
    make_mesh, shard_over_channels, halo_exchange_left, time_sharded_fir,
    MultichannelRx,
)
