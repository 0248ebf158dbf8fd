"""A/B the tiled-Viterbi options at the mixed-config tail shape
(32 ch x 200 soft pairs per step): jnp fallback (current), Pallas with
row padding at various chunks. All in one process. The scan body feeds
the carry into the input so XLA cannot hoist the work out of the loop."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qradiolink_tpu.fec.conv import CCSDS_K7
from qradiolink_tpu.fec import conv_ff, viterbi_pallas


def fence(v):
    return float(v)


def scan_time(fn, x, n_iter=20):
    @jax.jit
    def scan_n(xx):
        def body(c, _):
            out = fn(xx + c * 0.0)
            s = jnp.sum(out.astype(jnp.float32))
            return s * 1e-12, s
        _, vs = lax.scan(body, 0.0, None, length=n_iter)
        return jnp.sum(vs)
    v = scan_n(x)
    fence(v)
    t0 = time.perf_counter()
    fence(scan_n(x))
    return (time.perf_counter() - t0) / n_iter


def main():
    code = CCSDS_K7
    lead, T = 32, 200
    rng = np.random.default_rng(0)
    soft = jnp.asarray(
        rng.integers(0, 256, (lead, T, 2)).astype(np.float32))

    floor = scan_time(lambda x: x[..., 0] * 1.0001, soft)
    print(json.dumps({"case": "floor", "ms": round(floor * 1e3, 3)}),
          flush=True)

    # current path (chunk 512 -> R=32 -> jnp fallback)
    def jnp_path(x):
        xx = jnp.concatenate(
            [jnp.full((lead, 32, 2), 128.0), x.astype(jnp.float32),
             jnp.full((lead, 280, 2), 128.0)], axis=-2)
        return conv_ff.viterbi_decode_tiled.__wrapped__(code, xx, 512, 32) \
            if hasattr(conv_ff.viterbi_decode_tiled, "__wrapped__") else \
            conv_ff.viterbi_decode_tiled(code, xx, 512, 32)
    # force the jnp branch by monkeypatching availability off
    orig = viterbi_pallas.available
    viterbi_pallas.available = lambda: False
    try:
        dt = scan_time(lambda x: jnp_path(x)[..., 32:32 + T], soft)
        jnp_ref = np.asarray(jax.jit(
            lambda x: jnp_path(x)[..., 32:32 + T])(soft))
    finally:
        viterbi_pallas.available = orig
    print(json.dumps({"case": "jnp_fallback_chunk512",
                      "ms": round((dt - floor) * 1e3, 3)}), flush=True)

    for chunk in (64, 128, 256, 512):
        W = 32
        pad = (-(T + W)) % chunk
        T2 = T + W + pad
        C = T2 // chunk
        steps = W + chunk + W

        def run(x, chunk=chunk, pad=pad, W=W, T2=T2, C=C, steps=steps):
            xx = jnp.concatenate(
                [jnp.full((lead, W, 2), 128.0), x.astype(jnp.float32)],
                axis=-2)
            if pad:
                xx = jnp.concatenate(
                    [xx, jnp.full((lead, pad, 2), 128.0)], axis=-2)
            win = conv_ff._overlap_windows(xx, chunk, W)
            wr = win.reshape((lead * C, steps, 2))
            bits = viterbi_pallas.decode_windows(code, wr, W, min_rows=1)
            if bits is None:
                raise RuntimeError("kernel refused")
            bits = bits.reshape((lead, C, steps))[..., W: W + chunk]
            return bits.reshape((lead, C * chunk))[..., W: W + T]

        try:
            out = np.asarray(jax.jit(run)(soft))
            dt = scan_time(run, soft)
            print(json.dumps({
                "case": f"pallas_chunk{chunk}",
                "ms": round((dt - floor) * 1e3, 3),
                "agree_vs_jnp512": float((out == jnp_ref).mean())}),
                flush=True)
        except Exception as e:
            print(json.dumps({"case": f"pallas_chunk{chunk}",
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
