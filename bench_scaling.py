"""Scaling-efficiency harness: samples/s at 1/2/4/8 devices.

Measures weak scaling (work per device held constant) for the two
sharded configurations of SURVEY §2.8:

  (a) channel-sharded MultichannelRx — the 64-channel mixed-demod
      BASELINE config scaled to C = CH_PER_DEV * n channels, channel
      axis sharded over an n-device mesh;
  (b) time-sharded full digital chain (whole-chain halo exchange via
      ppermute) — sequence parallelism for one high-rate channel.

Efficiency definition: eff(n) = (n * T1) / Tn for weak scaling (ideal
Tn == n*T1 on shared hardware, == T1 on n real chips; both give
eff == 1 when the mesh adds no partitioning/collective overhead). On
this host the mesh is XLA's virtual CPU devices over 2 physical cores,
so eff(n) isolates the GSPMD + collective overhead — the same harness
runs unchanged on a real pod where it measures true weak scaling
(BASELINE target >= 80%).

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


def channel_sharded_point(n: int):
    """(samples_per_step, step_seconds) for n devices, weak scaling."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.parallel.sharding import make_mesh

    mesh = make_mesh(n, axis="ch")
    n_ch = CH_PER_DEV * n
    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    state = chain.init_state()
    rng = np.random.default_rng(0)
    iq = jnp.asarray((rng.standard_normal((n_ch, T_PER_CH))
                      + 1j * rng.standard_normal((n_ch, T_PER_CH)))
                     .astype(np.complex64) * 0.1)
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


def main(quick: bool = False):
    ns = N_DEVICES[:3] if quick else N_DEVICES
    _setup(max(ns))
    results = {"channel_sharded": [], "time_sharded": [],
               "host": {"physical_cores": os.cpu_count(),
                        "note": "virtual CPU mesh; eff(n) = n*T1/Tn "
                                "isolates GSPMD/collective overhead"}}
    for kind, point in (("channel_sharded", channel_sharded_point),
                        ("time_sharded", time_sharded_point)):
        t1 = None
        for n in ns:
            samples, dt = point(n)
            if t1 is None:
                t1 = dt
            eff = min(1.0, (n * t1) / dt) if n > 1 else 1.0
            results[kind].append({
                "devices": n, "samples_per_step": samples,
                "step_ms": round(dt * 1e3, 2),
                "msps": round(samples / dt / 1e6, 2),
                "weak_scaling_eff": round(eff, 3)})
    out_path = pathlib.Path(__file__).parent / "SCALING.json"
    out_path.write_text(json.dumps(results, indent=1))
    worst = min(r["weak_scaling_eff"]
                for k in ("channel_sharded", "time_sharded")
                for r in results[k])
    print(json.dumps({
        "metric": "weak-scaling efficiency 1->%d devices (cpu mesh)"
                  % max(ns),
        "value": worst, "unit": "fraction", "vs_baseline": worst / 0.8}))
    return results


if __name__ == "__main__":
    main(quick="--quick" in sys.argv)
