"""Scaling-efficiency harness: samples/s at 1/2/4/8 devices.

Measures weak scaling (work per device held constant) for the two
sharded configurations of SURVEY §2.8:

  (a) channel-sharded MultichannelRx — the 64-channel mixed-demod
      BASELINE config scaled to C = CH_PER_DEV * n channels, channel
      axis sharded over an n-device mesh;
  (b) time-sharded full digital chain (whole-chain halo exchange via
      ppermute) — sequence parallelism for one high-rate channel.

HONESTY NOTE (this host cannot measure weak scaling): the mesh is
XLA's virtual CPU devices over 2 physical cores, so per-device compute
resources are NOT held constant as n grows and n*T1/Tn says nothing
about pod behavior — it saturates the cores and reads ~1 regardless.
What IS measurable here and is reported:
  * raw step_ms / msps per point (the ground truth),
  * eff_weak_shared = n*T1/Tn, UNCLIPPED, labeled shared-host-only,
  * partition_overhead = Tn(sharded) / Tn(same shapes, single device):
    the GSPMD partitioning + collective cost at identical total work —
    the one number that transfers to a pod (it bounds the efficiency
    loss the mesh itself introduces; BASELINE >=80% needs it <= 1.25).
The same harness runs unchanged on a real pod, where eff_weak becomes
a true weak-scaling measurement.

Run standalone (JAX_PLATFORMS handled internally, fresh process
required) or via bench.py which spawns it as a subprocess and forwards
the JSON summary line. Writes SCALING.json at the repo root.
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

N_DEVICES = (1, 2, 4, 8)
CH_PER_DEV = 2
T_PER_CH = 100_000        # 100 ms @1 Msps per channel
T_LOCAL = 64_000          # time-sharded local block
HALO = 64_000


def _setup(n_max: int):
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_max}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    assert jax.default_backend() == "cpu" and len(jax.devices()) >= n_max
    return jax


def _time(fn, *args, iters=3):
    import jax
    jax.block_until_ready(fn(*args))       # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def channel_sharded_point(n: int, sharded: bool = True):
    """(samples_per_step, step_seconds) for n devices, weak scaling.

    sharded=False runs the SAME total shapes on one device — the
    partition-overhead baseline."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.parallel.sharding import make_mesh

    n_ch = CH_PER_DEV * n
    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    state = chain.init_state()
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.standard_normal((n_ch, T_PER_CH))
                      + 1j * rng.standard_normal((n_ch, T_PER_CH)))
                     .astype(np.complex64) * 0.1)
    if sharded:
        mesh = make_mesh(n, axis="ch")
        sh = NamedSharding(mesh, P("ch"))

        def place(t):
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, sh)
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_ch
                else x, t)

        state, iq = place(state), jax.device_put(iq, sh)
    step = jax.jit(lambda s, x: chain(s, x))
    dt = _time(step, state, iq)
    return n_ch * T_PER_CH, dt


def channel_sharded_point_nch(n_ch: int, n_dev: int):
    """Like channel_sharded_point but with explicit channel count —
    the single-process baseline for the multi-process comparison."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.parallel.sharding import make_mesh

    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    state = chain.init_state()
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.standard_normal((n_ch, T_PER_CH))
                      + 1j * rng.standard_normal((n_ch, T_PER_CH)))
                     .astype(np.complex64) * 0.1)
    mesh = make_mesh(n_dev, axis="ch")
    sh = NamedSharding(mesh, P("ch"))
    state = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sh)
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_ch
        else x, state)
    iq = jax.device_put(iq, sh)
    step = jax.jit(lambda s, x: chain(s, x))
    dt = _time(step, state, iq)
    return n_ch * T_PER_CH, dt


def time_sharded_point(n: int):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.parallel.sharding import make_mesh, time_sharded_chain

    mesh = make_mesh(n, axis="t")
    chain = Fsk4DemodFF(sync_window=320)
    fn = time_sharded_chain(chain, mesh, halo=HALO, out_keys=("bits",),
                            axis="t")
    rng = np.random.default_rng(0)
    t = n * T_LOCAL
    x = jnp.asarray((rng.standard_normal(t) + 1j * rng.standard_normal(t))
                    .astype(np.complex64) * 0.1)
    x = jax.device_put(x, NamedSharding(mesh, P("t")))
    dt = _time(fn, x)
    return t, dt


def _multihost_worker(pid: int, nproc: int, port: str, vdev: int,
                      n_ch: int, steps: int):
    """One bench process of the multi-process (DCN-proxy) measurement."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from qradiolink_tpu.parallel import multihost

    multihost.init_process(f"127.0.0.1:{port}", nproc, pid,
                           local_virtual_devices=vdev)
    import numpy as np
    from jax.experimental import multihost_utils
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF

    multihost_utils.sync_global_devices("boot")
    mesh = multihost.pod_mesh()
    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    step = multihost.multihost_step(chain, mesh)
    state = multihost.shard_state(
        __import__("jax").tree_util.tree_map(np.asarray,
                                             chain.init_state()), mesh)
    rows = multihost.local_channel_slice(n_ch)
    rng = np.random.default_rng(pid)
    local = (rng.standard_normal((rows.stop - rows.start, T_PER_CH))
             + 1j * rng.standard_normal((rows.stop - rows.start,
                                         T_PER_CH))).astype(np.complex64)
    x = multihost.distribute_channels(local * 0.1, n_ch, mesh)
    compiled = step.lower(state, x).compile()
    multihost_utils.sync_global_devices("compiled")
    state, out = compiled(state, x)          # warm execute
    _ = multihost.local_output_rows(out["symbols"])
    multihost_utils.sync_global_devices("warm")
    t0 = time.perf_counter()
    for _ in range(steps):
        state, out = compiled(state, x)
    _ = multihost.local_output_rows(out["symbols"])
    dt = (time.perf_counter() - t0) / steps
    multihost_utils.sync_global_devices("timed")
    if pid == 0:
        print(json.dumps({"multihost_step_ms": round(dt * 1e3, 2),
                          "n_ch": n_ch}), flush=True)
    multihost_utils.sync_global_devices("done")


def multihost_bench(nproc: int = 2, vdev: int = 2, steps: int = 3):
    """Spawn nproc jax.distributed processes (gloo over loopback) running
    the channel-sharded chain on a (host, ch) pod mesh, and compare with
    the SAME work on a single-process mesh with the same total device
    count — the multi-process (DCN-proxy) overhead."""
    import subprocess
    import socket

    n_ch = CH_PER_DEV * nproc * vdev
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = str(s.getsockname()[1])
    s.close()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, __file__, "--worker", str(pid), str(nproc), port,
         str(vdev), str(n_ch), str(steps)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
        text=True) for pid in range(nproc)]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    step_ms = None
    for out in outs:
        for line in out.splitlines():
            if line.startswith("{") and "multihost_step_ms" in line:
                step_ms = json.loads(line)["multihost_step_ms"]
    codes = [p.returncode for p in procs]
    if any(codes) or step_ms is None:
        tails = "\n---\n".join("\n".join(o.splitlines()[-8:]) for o in outs)
        raise RuntimeError(f"multihost bench failed (rc={codes}):\n{tails}")
    return n_ch, step_ms


def main(quick: bool = False):
    ns = N_DEVICES[:3] if quick else N_DEVICES
    _setup(max(ns))
    results = {"channel_sharded": [], "time_sharded": [],
               "host": {
                   "physical_cores": os.cpu_count(),
                   "note": "2-core host with a VIRTUAL device mesh: "
                           "weak scaling is NOT measurable here (see "
                           "module docstring). step_ms/msps are raw; "
                           "eff_weak_shared is n*T1/Tn unclipped and "
                           "shared-host-only; partition_overhead = "
                           "T(sharded)/T(same work, 1 device) is the "
                           "transferable GSPMD+collective cost."}}
    for kind, point in (("channel_sharded", channel_sharded_point),
                        ("time_sharded", time_sharded_point)):
        t1 = None
        for n in ns:
            samples, dt = point(n)
            if t1 is None:
                t1 = dt
            row = {
                "devices": n, "samples_per_step": samples,
                "step_ms": round(dt * 1e3, 2),
                "msps": round(samples / dt / 1e6, 2),
                "eff_weak_shared_host_only": round((n * t1) / dt, 3),
            }
            if kind == "channel_sharded" and n > 1:
                _, dt1 = channel_sharded_point(n, sharded=False)
                row["unsharded_same_work_ms"] = round(dt1 * 1e3, 2)
                row["partition_overhead"] = round(dt / dt1, 3)
            results[kind].append(row)
    # multi-process (DCN-proxy) point: 2 host processes x 2 virtual
    # devices with gloo collectives vs the same work single-process
    try:
        n_ch_mh, mh_ms = multihost_bench(nproc=2, vdev=2)
        _, dt_same = channel_sharded_point_nch(n_ch_mh, 4)
        results["multihost"] = {
            "processes": 2, "devices_per_process": 2, "n_ch": n_ch_mh,
            "step_ms": mh_ms,
            "single_process_same_work_ms": round(dt_same * 1e3, 2),
            "process_boundary_overhead": round(mh_ms / (dt_same * 1e3), 3),
            "note": "gloo over loopback on a shared 2-core host: the "
                    "overhead ratio is the DCN-proxy number; absolute "
                    "times are core-contended",
        }
    except Exception as e:  # pragma: no cover
        results["multihost"] = {"error": str(e)[:300]}

    out_path = pathlib.Path(__file__).parent / "SCALING.json"
    out_path.write_text(json.dumps(results, indent=1))
    ovs = [r["partition_overhead"] for r in results["channel_sharded"]
           if "partition_overhead" in r]
    worst_ov = max(ovs) if ovs else float("nan")
    print(json.dumps({
        "metric": "GSPMD partitioning overhead, channel-sharded "
                  "1->%d devices (cpu mesh; T_sharded / T_same_work_1dev;"
                  " weak scaling not measurable pre-pod)" % max(ns),
        "value": worst_ov, "unit": "x",
        # <=1.25x partitioning overhead is what a >=80% pod weak-scaling
        # target tolerates from the mesh itself
        "vs_baseline": round(1.25 / worst_ov, 2) if ovs else None}))
    return results


if __name__ == "__main__":
    if "--worker" in sys.argv:
        i = sys.argv.index("--worker")
        _multihost_worker(int(sys.argv[i + 1]), int(sys.argv[i + 2]),
                          sys.argv[i + 3], int(sys.argv[i + 4]),
                          int(sys.argv[i + 5]), int(sys.argv[i + 6]))
    else:
        main(quick="--quick" in sys.argv)
