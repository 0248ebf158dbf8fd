"""Per-kernel roofline benchmarks + full-chain throughput scan.

Times the hot kernels of the 4FSK/MMDVM paths on the current JAX
backend and compares each against the chip's speed-of-light (v5e:
~819 GB/s HBM, ~197 bf16 TFLOP/s; the DSP kernels here are
bandwidth-bound, so the roofline is min(bytes/BW, flops/peak)).

Prints one JSON line per kernel:
  {"metric": "...", "value": ms, "unit": "ms", "roofline_ms": r,
   "efficiency": value_vs_roofline}
and a full-chain line per channel count. Used by bench.py --kernels
and runnable standalone.
"""

from __future__ import annotations

import json
import time

import numpy as np

HBM_GBPS = 819.0          # v5e HBM bandwidth
PEAK_F32_GFLOPS = 98_000.0  # v5e ~197 TFLOPs bf16 -> ~1/2 for f32 MXU


_FENCE_FN = None


def _fence(y):
    """Fetch a jitted f32 scalar (the only reliable axon fence). The
    jitted reducer is created ONCE — a fresh lambda per call would
    recompile inside the timed region and pollute micro-benchmarks."""
    global _FENCE_FN
    import jax
    import jax.numpy as jnp
    if _FENCE_FN is None:
        _FENCE_FN = jax.jit(
            lambda v: jnp.sum(jnp.abs(v)).astype(jnp.float32))
    return float(_FENCE_FN(y))


def _time(fn, *args, iters=10):
    y = fn(*args)
    _fence(y if not isinstance(y, tuple) else y[-1])
    t0 = time.perf_counter()
    for _ in range(iters):
        y = fn(*args)
    _fence(y if not isinstance(y, tuple) else y[-1])
    return (time.perf_counter() - t0) / iters


def report(name, dt, bytes_moved, flops):
    roof = max(bytes_moved / (HBM_GBPS * 1e9),
               flops / (PEAK_F32_GFLOPS * 1e9))
    print(json.dumps({
        "metric": f"kernel:{name}", "value": round(dt * 1e3, 3),
        "unit": "ms", "roofline_ms": round(roof * 1e3, 3),
        "efficiency": round(roof / dt, 3)}), flush=True)


def kernel_benches(C=128, T=200_000):
    import jax
    import jax.numpy as jnp
    from qradiolink_tpu.ops import firdes
    from qradiolink_tpu.ops.fir import conv1d_valid
    from qradiolink_tpu.ops.channelizer import PfbChannelizer
    from qradiolink_tpu.ops.analog import QuadratureDemod
    from qradiolink_tpu.fec.conv_ff import TiledViterbi
    from qradiolink_tpu.core import put_iq

    rng = np.random.default_rng(0)

    # 0. dispatch floor: a trivial op — on the tunneled axon chip each
    # pallas_call/jit dispatch costs ~2-2.5 ms regardless of size, so
    # single-kernel times sit on this floor; the fused whole-chain
    # dispatch amortizes it (which is why chains beat kernel sums)
    xz = jnp.ones((8, 128), jnp.float32)
    f0 = jax.jit(lambda v: v * 1.0001)
    dt = _time(f0, xz)
    report("dispatch_floor_noop", dt, bytes_moved=xz.size * 8, flops=xz.size)

    # 1. decimating front FIR (1 Msps -> 20 ksps head, 419 taps /50)
    taps = firdes.low_pass(1.0, 1_000_000, 10_000, 10_000,
                           firdes.WIN_BLACKMAN_HARRIS)
    k = len(taps)
    x = jnp.asarray(rng.standard_normal((C, T + k - 1)).astype(np.float32))
    f1 = jax.jit(lambda v: conv1d_valid(v, jnp.asarray(taps), stride=50))
    dt = _time(f1, x)
    report("decim_fir_1Msps_419t_s50", dt,
           bytes_moved=x.size * 4 + C * (T // 50) * 4,
           flops=2 * C * (T // 50) * k)

    # 2. channel FIR at 20 ksps (55 taps, stride 1) — post-decimation
    t2 = T // 50
    x2 = jnp.asarray(rng.standard_normal((C, t2 + 54)).astype(np.float32))
    taps2 = firdes.low_pass(1.0, 20_000, 3000.0, 1500.0,
                            firdes.WIN_BLACKMAN_HARRIS)
    f2 = jax.jit(lambda v: conv1d_valid(v, jnp.asarray(taps2), stride=1))
    dt = _time(f2, x2)
    report("channel_fir_20k_55t", dt,
           bytes_moved=x2.size * 4 * 2, flops=2 * C * t2 * len(taps2))

    # 3. PFB channelizer (10-branch, 250 ksps block)
    B = max(C // 8, 1)
    ch = PfbChannelizer(10, lead_shape=(B,))
    xc = put_iq((rng.standard_normal((B, 250_000))
                 + 1j * rng.standard_normal((B, 250_000)))
                .astype(np.complex64))
    st = jax.jit(ch.init_state)()
    f3 = jax.jit(lambda s, v: ch(s, v)[1])
    dt = _time(f3, st, xc)
    ntaps = int(np.asarray(ch.taps).size) if hasattr(ch, "taps") else 200
    report("pfb_channelizer_10br", dt,
           bytes_moved=xc.size * 8 * 2,
           flops=8 * xc.size * (ntaps / 10 + np.log2(10)))

    # 4. quadrature demod at 24 ksps x C channels
    q = QuadratureDemod(1.0, lead_shape=(C,))
    xq = put_iq((rng.standard_normal((C, 24_000))
                 + 1j * rng.standard_normal((C, 24_000)))
                .astype(np.complex64))
    sq = jax.jit(q.init_state)()
    f4 = jax.jit(lambda s, v: q(s, v)[1])
    dt = _time(f4, sq, xq)
    report("quad_demod_24k", dt, bytes_moved=xq.size * 12,
           flops=10 * xq.size)

    # 5. tiled Viterbi (K=7 CCSDS soft decode, 4000 bits x C)
    tv = TiledViterbi(lead_shape=(C,))
    soft = jnp.asarray(
        rng.integers(0, 256, (C, 4000, 2)).astype(np.float32))
    sv = jax.jit(tv.init_state)()
    f5 = jax.jit(lambda s, v: tv(s, v)[1])
    dt = _time(f5, sv, soft)
    # ACS: 64 states x 2 branches x add-compare-select ~ 6 ops/bit
    report("tiled_viterbi_k7", dt, bytes_moved=soft.size * 5,
           flops=C * 4000 * 64 * 6)


def chain_benches(channel_counts=(64, 128, 256), t=200_000):
    import jax
    import jax.numpy as jnp
    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.core import device_init_state, put_iq

    rng = np.random.default_rng(0)
    best = (0.0, 0)
    for n_ch in channel_counts:
        chain = Fsk4DemodFF(lead_shape=(n_ch,))
        state = device_init_state(chain)
        iq = put_iq((rng.standard_normal((n_ch, t))
                     + 1j * rng.standard_normal((n_ch, t)))
                    .astype(np.complex64) * 0.1)
        step = jax.jit(lambda s, x: chain(s, x))
        fence = jax.jit(
            lambda o: jnp.sum(o["symbols"]).astype(jnp.float32))
        st, out = step(state, iq)
        float(fence(out))
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            st, out = step(st, iq)
        float(fence(out))
        dt = (time.perf_counter() - t0) / n
        msps = n_ch * t / dt / 1e6
        print(json.dumps({
            "metric": f"4FSK_2K chain {n_ch}ch@1Msps", "value": round(msps, 1),
            "unit": "Msamples/s/chip", "step_ms": round(dt * 1e3, 2),
            "aggregate_rt_factor": round(msps / n_ch, 2)}), flush=True)
        if msps > best[0]:
            best = (msps, n_ch)
    return best


if __name__ == "__main__":
    import sys
    if "--smoke" in sys.argv:
        import jax
        jax.config.update("jax_platforms", "cpu")
        print(json.dumps({"platform": "cpu-smoke"}), flush=True)
        kernel_benches(C=4, T=20_000)
        chain_benches(channel_counts=(2,), t=50_000)
    else:
        import jax
        print(json.dumps({"platform": jax.devices()[0].platform}),
              flush=True)
        kernel_benches()
        chain_benches()
