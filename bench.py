"""Headline benchmark: aggregate IQ throughput of the 4FSK_2K demod chain.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "Msamples/s/chip", "vs_baseline": N}

Baseline = the reference's real-time internal processing rate of 1 Msps per
channel (reference src/gr/gr_demod_base.cpp:21): a GNU Radio chain keeps up
with exactly 1x real-time by construction. vs_baseline is therefore the
real-time factor per chip; the BASELINE.json target is >=10.

Run on whatever backend JAX selects (the driver runs it on one real TPU
chip). Batches many channels so the chip is saturated; reports aggregate
input IQ samples/s.
"""

from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from qradiolink_tpu.chains.fsk import Fsk4DemodFF
    from qradiolink_tpu.core import device_init_state, put_iq

    platform = jax.devices()[0].platform
    # channels batched to saturate the chip; modest on CPU so CI stays fast
    n_ch = 64 if platform == "tpu" else 4
    t = 200_000  # 200 ms at 1 Msps per channel per step

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
    # does not actually synchronize and eager ops on int8/complex are
    # unimplemented, so the only reliable fence is fetching a jitted f32
    # scalar to the host
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
        "vs_baseline": round(msps / 1.0, 2),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
