"""Multi-host execution: process-sharded meshes over DCN.

The reference scales past one machine only by pushing baseband over
process boundaries (ZeroMQ ipc:// per channel to external MMDVMHost
processes, /root/reference/src/gr/gr_mmdvm_sink.cpp:44-50; UDP audio,
/root/reference/src/udpclient.cpp). The TPU-native equivalent keeps the
DSP on one logical device mesh spanning every host: each host ingests
the IQ for its locally-attached channels, `jax.make_array_from_process_
local_data` assembles the global channel-sharded array without any
cross-host copy of sample data, and XLA inserts ICI/DCN collectives only
where a chain genuinely needs them (feedforward chains need none — the
channel axis is embarrassingly parallel; time-sharded chains exchange
halos via ppermute).

On a real pod each process sees its local TPU chips; in CI the same code
runs as N host processes x M virtual CPU devices with XLA's Gloo
collectives over loopback (tests/test_multihost.py runs 2x4), so a pod
run is a deployment config change, not a code change.

SURVEY §2.8 multi-host row; BASELINE scaling target >=80% 1 -> N hosts.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_process(coordinator: str, num_processes: int, process_id: int,
                 local_virtual_devices: int | None = None) -> None:
    """Join the distributed runtime.

    coordinator: "host:port" of process 0. For CPU-based rehearsal set
    local_virtual_devices to fan one process into N virtual devices
    (must be called before any JAX backend initialization).
    """
    if local_virtual_devices is not None:
        import os
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{local_virtual_devices}").strip()
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    # uncommitted arrays (e.g. filter taps built at chain construction)
    # must land on a process-LOCAL device: the global default is device 0
    # of process 0, which other hosts cannot address when tracing closes
    # over such constants
    jax.config.update("jax_default_device", jax.local_devices()[0])


def pod_mesh(axes: tuple = ("host", "ch")) -> Mesh:
    """Mesh over (process, local-device): axis 0 spans hosts (DCN),
    axis 1 the devices within a host (ICI on a pod)."""
    devs = jax.devices()
    n_proc = jax.process_count()
    if len(devs) % n_proc:
        raise ValueError(f"{len(devs)} devices not divisible by "
                         f"{n_proc} processes")
    grid = np.asarray(devs).reshape(n_proc, -1)
    return Mesh(grid, axes)


def channel_spec(mesh: Mesh) -> NamedSharding:
    """Channel-major placement: the leading (channel) axis sharded over
    BOTH mesh axes, so each host owns a contiguous channel block and
    each of its devices a contiguous sub-block."""
    return NamedSharding(mesh, P(mesh.axis_names))


def local_channel_slice(n_channels: int) -> slice:
    """Which rows of the global channel axis this host must ingest
    (contiguous block, matching channel_spec placement)."""
    n_proc = jax.process_count()
    if n_channels % n_proc:
        raise ValueError(f"{n_channels} channels not divisible by "
                         f"{n_proc} hosts")
    per = n_channels // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def distribute_channels(local_rows: np.ndarray, n_channels: int,
                        mesh: Mesh) -> jax.Array:
    """Assemble the global (C, ...) array from this host's local ingest
    block (no cross-host sample transfer; each host contributes the rows
    from local_channel_slice)."""
    sh = channel_spec(mesh)
    global_shape = (n_channels,) + tuple(local_rows.shape[1:])
    return jax.make_array_from_process_local_data(sh, local_rows,
                                                  global_shape)


def replicate(tree, mesh: Mesh):
    """Fully-replicated placement for small host-computed values (masks,
    settings) consumed inside the sharded step."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sh, np.asarray(x), np.asarray(x).shape), tree)


def shard_state(state, mesh: Mesh):
    """Place a chain's zero-init state with the channel axis sharded
    (leading-axis leaves) — call on identical host-side pytrees."""
    sh = channel_spec(mesh)

    def leaf(x):
        x = np.asarray(x)
        if x.ndim >= 1 and x.shape[0] % mesh.devices.size == 0:
            per = x.shape[0] // jax.process_count()
            pid = jax.process_index()
            return jax.make_array_from_process_local_data(
                sh, x[pid * per:(pid + 1) * per], x.shape)
        return jax.make_array_from_process_local_data(
            NamedSharding(mesh, P()), x, x.shape)
    return jax.tree_util.tree_map(leaf, state)


def multihost_step(chain, mesh: Mesh):
    """Jit a chain step with channel-sharded inputs/outputs over the pod
    mesh. The returned callable takes (state, iq) global arrays."""
    sh = channel_spec(mesh)

    @jax.jit
    def step(state, x):
        x = jax.tree_util.tree_map(
            lambda v: jax.lax.with_sharding_constraint(v, sh)
            if getattr(v, "ndim", 0) >= 1 else v, x)
        return chain(state, x)

    return step


def local_output_rows(arr: jax.Array) -> np.ndarray:
    """This host's rows of a channel-sharded output (audio/bit egress
    stays host-local, like the reference's per-channel UDP/ZMQ sinks)."""
    shards = sorted((s for s in arr.addressable_shards),
                    key=lambda s: s.index[0].start or 0)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)
