"""Headline benchmark: aggregate IQ throughput of the 4FSK_2K demod chain.

Prints one JSON line per auxiliary metric, then THE headline line LAST:

  {"metric": "...", "value": N, "unit": "Msamples/s/chip",
   "vs_baseline": N}

Baseline = the reference's real-time internal processing rate of 1 Msps
per channel (reference src/gr/gr_demod_base.cpp:21): a GNU Radio chain
keeps up with exactly 1x real-time by construction, so the honest
figure of merit is the AGGREGATE real-time factor
  vs_baseline = Msamples/s / n_channels
(how many 1 Msps channels' worth of IQ one chip absorbs per channel
carried). BASELINE.json target: >= 10.

Measurement: the step is iterated with STATE CARRIED between calls
(streaming semantics), BOTH as a host loop and as a lax.scan inside one
jit. The scan number is the device-true throughput (one dispatch per
N steps — what a production ingest loop that batches steps achieves);
the host-loop number includes the axon tunnel's multi-ms per-dispatch
cost and is reported for transparency. IQ enters as core.IqPair f32
planes — the production ingest format (complex64 transfers and ops are
pathologically slow on this backend; see core.IqPair).

Auxiliary lines: the BASELINE configs[4] mixed 64-channel config
(PFB channelizer + 32x 4FSK + 32x NBFM per-channel demods) and the
GSPMD partitioning overhead from SCALING.json when present.
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np


def _fence(val):
    return float(val)


def _bench_step_host(step, checksum, state, iq, n_iter):
    st, out = step(state, iq)
    _fence(checksum(out))
    t0 = time.perf_counter()
    for _ in range(n_iter):
        st, out = step(st, iq)
    _fence(checksum(out))
    return (time.perf_counter() - t0) / n_iter


def _bench_step_scan(chain, state, iq, n_iter, reduce_key="symbols"):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def scan_n(s, x):
        def body(c, _):
            st, out = chain(c, x)
            return st, jnp.sum(out[reduce_key]).astype(jnp.float32)
        st, vs = lax.scan(body, s, None, length=n_iter)
        return st, jnp.sum(vs)

    st, v = scan_n(state, iq)
    _fence(v)
    t0 = time.perf_counter()
    st, v = scan_n(st, iq)
    _fence(v)
    return (time.perf_counter() - t0) / n_iter


def bench_4fsk(platform, n_ch, t, emit=True):
    import jax
    import jax.numpy as jnp

    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.core import device_init_state, put_iq_pair

    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    state = device_init_state(chain)
    rng = np.random.default_rng(0)
    iq = put_iq_pair(
        (rng.standard_normal((n_ch, t)) + 1j * rng.standard_normal((n_ch, t)))
        .astype(np.complex64) * 0.1)

    # the axon tunnel costs ~20-30 ms per dispatch; the scan path exists
    # precisely to amortize that, so give it enough steps per dispatch
    # that the residual per-step share is small (25 steps => <~1 ms)
    n_scan = 25 if platform == "tpu" else 2
    n_iter = 10 if platform == "tpu" else 2
    dt_scan = _bench_step_scan(chain, state, iq, n_scan)
    step = jax.jit(lambda s, x: chain(s, x))
    checksum = jax.jit(lambda o: jnp.sum(o["symbols"]).astype(jnp.float32))
    dt_host = _bench_step_host(step, checksum, state, iq, n_iter)

    msps_scan = n_ch * t / dt_scan / 1e6
    msps_host = n_ch * t / dt_host / 1e6
    if emit:
        print(json.dumps({
            "metric": f"4FSK_2K chain {n_ch}ch@1Msps host-loop "
                      "(incl. per-dispatch tunnel cost)",
            "value": round(msps_host, 1), "unit": "Msamples/s/chip",
            "step_ms": round(dt_host * 1e3, 2),
            "vs_baseline": round(msps_host / n_ch, 2)}), flush=True)
    return msps_scan, dt_scan


def bench_mixed64(platform):
    """BASELINE configs[4]: 64-channel PFB channelizer front-end with
    mixed per-channel demods (32x 4FSK + 32x NBFM) on one chip
    (reference gr_demod_mmdvm_multi2.cpp:98-135 channelizer pattern)."""
    import jax
    import jax.numpy as jnp

    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.chains.nbfm import NbfmDemod
    from qradiolink_tpu.core import put_iq_pair
    from qradiolink_tpu.parallel.sharding import MultichannelRx

    n_ch = 64 if platform == "tpu" else 4
    half = n_ch // 2
    t_per_ch = 100_000 if platform == "tpu" else 20_000
    rx = MultichannelRx(
        n_ch,
        groups=[
            (lambda lead_shape: Fsk4DemodFF(lead_shape=lead_shape),
             list(range(half))),
            (lambda lead_shape: NbfmDemod(lead_shape=lead_shape),
             list(range(half, n_ch))),
        ])
    state = jax.jit(rx.init_state)()
    rng = np.random.default_rng(0)
    t = n_ch * t_per_ch
    iq = put_iq_pair((rng.standard_normal(t) + 1j * rng.standard_normal(t))
                     .astype(np.complex64) * 0.05)

    step = jax.jit(lambda s, x: rx(s, x))
    checksum = jax.jit(lambda outs: (
        jnp.sum(outs[0]["symbols"]).astype(jnp.float32)
        + jnp.sum(outs[1]["audio"]).astype(jnp.float32)))

    st, outs = step(state, iq)
    _fence(checksum(outs))
    n_iter = 5 if platform == "tpu" else 1
    t0 = time.perf_counter()
    for _ in range(n_iter):
        st, outs = step(st, iq)
    _fence(checksum(outs))
    dt = (time.perf_counter() - t0) / n_iter
    msps = t / dt / 1e6
    print(json.dumps({
        "metric": f"mixed {n_ch}-ch channelizer + {half}x4FSK/{half}xNBFM "
                  f"host-loop (incl. per-dispatch tunnel cost, {platform})",
        "value": round(msps, 1), "unit": "Msamples/s/chip",
        "step_ms": round(dt * 1e3, 2),
        "aggregate_rt_factor": round(msps / n_ch, 2),
        "vs_baseline": round(msps / n_ch, 2)}), flush=True)

    # device-true: state-carried steps iterated inside one jit (same
    # scan-in-jit methodology as the 4FSK headline lines). The axon
    # tunnel costs ~20-30 ms PER DISPATCH, so the scan must carry
    # enough steps that the residual per-step share is small — at
    # n=50 the overhead contributes <0.5 ms/step (measured: 6.7 ms/step
    # at n=5 vs 2.2 ms/step at n=50 for the identical program). The
    # axon compile helper has been seen to crash on the full mixed
    # program under lax.scan; fall back to host-loop minus the measured
    # per-dispatch floor when that happens.
    from jax import lax

    n_scan = 50 if platform == "tpu" else 1

    @jax.jit
    def scan_n(s, x):
        def body(c, _):
            st, outs = rx(c, x)
            return st, (jnp.sum(outs[0]["symbols"])
                        + jnp.sum(outs[1]["audio"])).astype(jnp.float32)
        st, vs = lax.scan(body, s, None, length=n_scan)
        return st, jnp.sum(vs)

    try:
        st, v = scan_n(state, iq)
        _fence(v)
        t0 = time.perf_counter()
        st, v = scan_n(st, iq)
        _fence(v)
        dt2 = (time.perf_counter() - t0) / n_scan
        method = "scan-in-jit"
    except Exception:
        # per-dispatch floor: a no-op jitted call in the same process
        noop = jax.jit(lambda v: v * 1.0001)
        z = jnp.ones((8, 128), jnp.float32)
        _fence(jnp.sum(noop(z)))
        t0 = time.perf_counter()
        for _ in range(20):
            z2 = noop(z)
        _fence(jnp.sum(z2))
        floor = (time.perf_counter() - t0) / 20
        dt2 = max(dt - floor, 1e-6)
        method = "host-loop minus dispatch floor (scan compile fails)"
    msps = t / dt2 / 1e6
    print(json.dumps({
        "metric": f"mixed {n_ch}-ch channelizer + {half}x4FSK/{half}xNBFM "
                  f"device-true [{method}] (BASELINE configs[4], "
                  f"{platform})",
        "value": round(msps, 1), "unit": "Msamples/s/chip",
        "step_ms": round(dt2 * 1e3, 2),
        "aggregate_rt_factor": round(msps / n_ch, 2),
        "vs_baseline": round(msps / n_ch, 2)}), flush=True)


def main():
    import jax

    platform = jax.devices()[0].platform
    t = 200_000  # 200 ms at 1 Msps per channel per step

    scaling = pathlib.Path(__file__).parent / "SCALING.json"
    if scaling.exists():
        data = json.loads(scaling.read_text())
        ovs = [r.get("partition_overhead")
               for r in data.get("channel_sharded", [])
               if r.get("partition_overhead")]
        if ovs:
            worst = max(ovs)
            print(json.dumps({
                "metric": "GSPMD partitioning overhead 1->8 devices "
                          "(cpu mesh; weak scaling unmeasurable pre-pod)",
                "value": worst, "unit": "x",
                "vs_baseline": round(1.25 / worst, 2)}), flush=True)

    try:
        bench_mixed64(platform)
    except Exception as e:  # mixed config must never sink the headline
        print(json.dumps({"metric": "mixed 64-ch config FAILED",
                          "error": str(e)[:200]}), flush=True)

    # channel-count scan, headline = best config
    counts = (128, 256, 512, 1024, 2048) if platform == "tpu" else (4,)
    best = None
    first = None
    for n_ch in counts:
        try:
            msps_scan, dt_scan = bench_4fsk(platform, n_ch, t)
        except Exception as e:  # one config must never sink the headline
            print(json.dumps({"metric": f"4FSK_2K chain {n_ch}ch FAILED",
                              "error": str(e)[:200]}), flush=True)
            continue
        print(json.dumps({
            "metric": f"4FSK_2K chain {n_ch}ch@1Msps scan-in-jit "
                      "(device-true)",
            "value": round(msps_scan, 1), "unit": "Msamples/s/chip",
            "step_ms": round(dt_scan * 1e3, 2),
            "vs_baseline": round(msps_scan / n_ch, 2)}), flush=True)
        if best is None or msps_scan > best[0]:
            best = (msps_scan, n_ch)
        if first is None:
            first = (msps_scan, n_ch)

    # the scan trades per-channel real-time margin for aggregate
    # throughput; surface the margin end of the curve explicitly
    if first is not None:
        print(json.dumps({
            "metric": "peak per-channel real-time margin "
                      f"({first[1]} ch config)",
            "value": round(first[0] / first[1], 2), "unit": "x real-time "
            "per carried 1 Msps channel"}), flush=True)

    # which stages the headline chain serves from the Pallas kernels at
    # the winning shape (trace-time decisions; no silent fallbacks)
    try:
        import jax.numpy as jnp
        from qradiolink_tpu.chains.fsk import Fsk4DemodFF
        from qradiolink_tpu.core import IqPair
        from qradiolink_tpu.utils.profiling import pallas_paths

        n_best = best[1]
        chain = Fsk4DemodFF(lead_shape=(n_best,))
        st_shape = jax.eval_shape(chain.init_state)
        xs = IqPair(jax.ShapeDtypeStruct((n_best, t), jnp.float32),
                    jax.ShapeDtypeStruct((n_best, t), jnp.float32))
        pallas_paths.reset()
        jax.eval_shape(lambda s, v: chain(s, v), st_shape, xs)
        rep = {k: {kk: v[kk] for kk in ("pallas", "fallback")}
               for k, v in pallas_paths.report().items()}
        print(json.dumps({"metric": "pallas-served stages at headline "
                                    "shape", "paths": rep}), flush=True)
    except Exception:
        pass

    msps, n_ch = best
    print(json.dumps({
        "metric": "4FSK_2K demod aggregate IQ throughput "
                  f"({n_ch} ch @1 Msps, {platform}, scan-in-jit)",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        # honest aggregate real-time factor: chip throughput divided by
        # the total real-time sample rate of the carried channels
        "vs_baseline": round(msps / n_ch, 2),
    }))


if __name__ == "__main__":
    main()
