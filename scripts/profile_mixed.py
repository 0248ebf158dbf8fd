"""Break the BASELINE mixed 64-ch step into stages and time each
scan-in-jit (state carried), subtracting the dispatch floor — so we can
see where the step's time actually goes on the real chip."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qradiolink_tpu.chains.fsk import Fsk4DemodFF
from qradiolink_tpu.chains.nbfm import NbfmDemod
from qradiolink_tpu.core import put_iq_pair, iq_take, IqPair
from qradiolink_tpu.ops.channelizer import PfbChannelizer


def fence(v):
    return float(v)


def scan_time(step, state, x, n_iter=10, reduce=lambda o: jnp.sum(o)):
    @jax.jit
    def scan_n(s, xx):
        def body(c, _):
            st, out = step(c, xx)
            return st, reduce(out).astype(jnp.float32)
        st, vs = lax.scan(body, s, None, length=n_iter)
        return st, jnp.sum(vs)
    st, v = scan_n(state, x)
    fence(v)
    t0 = time.perf_counter()
    st, v = scan_n(st, x)
    fence(v)
    return (time.perf_counter() - t0) / n_iter


def main():
    n_ch, half, t_per_ch = 64, 32, 100_000
    t = n_ch * t_per_ch
    rng = np.random.default_rng(0)
    iq = put_iq_pair((rng.standard_normal(t) + 1j * rng.standard_normal(t))
                     .astype(np.complex64) * 0.05)

    # dispatch floor
    floor = scan_time(lambda s, x: (s, IqPair(x.re * 1.0001, x.im)), 0.0, iq,
                      reduce=lambda o: jnp.sum(o.re))
    print(json.dumps({"stage": "floor", "ms": round(floor * 1e3, 3)}),
          flush=True)

    chz = PfbChannelizer(n_ch)
    st = chz.init_state()
    dt = scan_time(lambda s, x: chz(s, x), st, iq,
                   reduce=lambda o: jnp.sum(o.re))
    print(json.dumps({"stage": "channelizer", "ms": round((dt - floor) * 1e3, 3)}),
          flush=True)

    # channelizer output for the demod groups
    _, chans = jax.jit(lambda s, x: chz(s, x))(st, iq)
    chans = jax.block_until_ready(chans)

    # iq_take gather only
    idx0 = np.arange(half, dtype=np.int32)
    idx1 = np.arange(half, n_ch, dtype=np.int32)
    dt = scan_time(lambda s, x: (s, (iq_take(x, idx0, axis=-2),
                                     iq_take(x, idx1, axis=-2))),
                   0.0, chans,
                   reduce=lambda o: jnp.sum(o[0].re) + jnp.sum(o[1].re))
    print(json.dumps({"stage": "iq_take x2", "ms": round((dt - floor) * 1e3, 3)}),
          flush=True)

    x0 = jax.block_until_ready(jax.jit(lambda c: iq_take(c, idx0, axis=-2))(chans))
    x1 = jax.block_until_ready(jax.jit(lambda c: iq_take(c, idx1, axis=-2))(chans))

    fsk = Fsk4DemodFF(lead_shape=(half,))
    dt = scan_time(lambda s, x: fsk(s, x), fsk.init_state(), x0,
                   reduce=lambda o: jnp.sum(o["symbols"]))
    print(json.dumps({"stage": "fsk4_group(32x100k)", "ms": round((dt - floor) * 1e3, 3)}),
          flush=True)

    nb = NbfmDemod(lead_shape=(half,))
    dt = scan_time(lambda s, x: nb(s, x), nb.init_state(), x1,
                   reduce=lambda o: jnp.sum(o["audio"]))
    print(json.dumps({"stage": "nbfm_group(32x100k)", "ms": round((dt - floor) * 1e3, 3)}),
          flush=True)

    # full step
    from qradiolink_tpu.parallel.sharding import MultichannelRx
    rx = MultichannelRx(
        n_ch,
        groups=[(lambda lead_shape: Fsk4DemodFF(lead_shape=lead_shape),
                 list(range(half))),
                (lambda lead_shape: NbfmDemod(lead_shape=lead_shape),
                 list(range(half, n_ch)))])
    st = jax.jit(rx.init_state)()
    dt = scan_time(lambda s, x: rx(s, x), st, iq,
                   reduce=lambda o: jnp.sum(o[0]["symbols"]) + jnp.sum(o[1]["audio"]))
    print(json.dumps({"stage": "full_step", "ms": round((dt - floor) * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
