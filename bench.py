"""Headline benchmark: aggregate IQ throughput of the 4FSK_2K demod chain.

Prints one JSON line per auxiliary metric (scaling efficiency from
SCALING.json when present) followed by THE headline line LAST:

  {"metric": "...", "value": N, "unit": "Msamples/s/chip",
   "vs_baseline": N}

Baseline = the reference's real-time internal processing rate of 1 Msps
per channel (reference src/gr/gr_demod_base.cpp:21): a GNU Radio chain
keeps up with exactly 1x real-time by construction, so the honest
figure of merit is the AGGREGATE real-time factor
  vs_baseline = Msamples/s / n_channels
(how many 1 Msps channels' worth of IQ one chip absorbs per channel
carried). BASELINE.json target: >= 10.

Config: 128 channels x 200 ms blocks — the measured throughput optimum
on v5e (64ch under-utilizes the chip, 256ch spills; see
bench_kernels.py chain scan). Per-kernel rooflines live in
bench_kernels.py (slow first-connect on the tunneled chip, so they are
not part of the driver's headline run).
"""

from __future__ import annotations

import json
import pathlib
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.core import device_init_state, put_iq

    platform = jax.devices()[0].platform
    # throughput-optimal batch on the real chip; modest on CPU for CI
    n_ch = 128 if platform == "tpu" else 4
    t = 200_000  # 200 ms at 1 Msps per channel per step

    # report weak-scaling efficiency measured by bench_scaling.py (CPU
    # mesh harness; run separately — its numbers don't change per-chip)
    scaling = pathlib.Path(__file__).parent / "SCALING.json"
    if scaling.exists():
        data = json.loads(scaling.read_text())
        worst = min(r["weak_scaling_eff"]
                    for k in ("channel_sharded", "time_sharded")
                    for r in data.get(k, [])
                    if "weak_scaling_eff" in r) if data else None
        if worst is not None:
            print(json.dumps({
                "metric": "weak-scaling efficiency 1->8 devices (cpu mesh)",
                "value": worst, "unit": "fraction",
                "vs_baseline": round(worst / 0.8, 2)}))

    # the TPU-native chain: feedforward symbol sync + tiled Viterbi (no
    # scan/gather — see chains/fsk.py Fsk4DemodFF); loopback-BER-verified
    # against the same TX as the feedback chain in tests/test_chains_digital
    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    # state created ON device by a jitted program and IQ transferred as f32
    # planes: the axon backend cannot device_put complex64 (see core.py)
    state = device_init_state(chain)
    rng = np.random.default_rng(0)
    iq = put_iq(
        (rng.standard_normal((n_ch, t)) + 1j * rng.standard_normal((n_ch, t)))
        .astype(np.complex64) * 0.1)

    step = jax.jit(lambda s, x: chain(s, x))
    # checksum computed inside jit: on the axon backend block_until_ready
    # does not actually synchronize, so the only reliable fence is
    # fetching a jitted f32 scalar to the host
    checksum = jax.jit(lambda o: jnp.sum(o["symbols"]).astype(jnp.float32))

    # warmup/compile
    state2, out = step(state, iq)
    float(checksum(out))

    n_iter = 20 if platform == "tpu" else 3
    st = state
    t0 = time.perf_counter()
    for _ in range(n_iter):
        st, out = step(st, iq)
    float(checksum(out))
    dt = time.perf_counter() - t0

    samples = n_ch * t * n_iter
    msps = samples / dt / 1e6
    result = {
        "metric": "4FSK_2K demod aggregate IQ throughput "
                  f"({n_ch} ch @1 Msps, {platform})",
        "value": round(msps, 2),
        "unit": "Msamples/s/chip",
        # honest aggregate real-time factor: chip throughput divided by
        # the total real-time sample rate of the carried channels
        "vs_baseline": round(msps / n_ch, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
