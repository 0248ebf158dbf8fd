"""Stage-by-stage timing of the Fsk4DemodFF group at mixed-config shapes
(32 channels x 100k samples), all measured in ONE process so numbers are
comparable (the axon tunnel's per-process clocking varies ~±40%)."""
import json
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from qradiolink_tpu.chains.fsk import Fsk4DemodFF
from qradiolink_tpu.chains.nbfm import NbfmDemod
from qradiolink_tpu.core import put_iq_pair, IqPair


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
    half, t_per_ch = 32, 100_000
    rng = np.random.default_rng(0)
    x0 = put_iq_pair(
        (rng.standard_normal((half, t_per_ch))
         + 1j * rng.standard_normal((half, t_per_ch)))
        .astype(np.complex64) * 0.1)

    floor = scan_time(lambda s, x: (s, IqPair(x.re * 1.0001, x.im)), 0.0, x0,
                      reduce=lambda o: jnp.sum(o.re))
    print(json.dumps({"stage": "floor", "ms": round(floor * 1e3, 3)}),
          flush=True)

    fsk = Fsk4DemodFF(lead_shape=(half,))

    def stage_time(blocks, x_in, reduce):
        from qradiolink_tpu.core import init_states
        from qradiolink_tpu.core import Sequencer

        def step(s, x):
            seq = Sequencer(s)
            y = x
            for b in blocks:
                y = seq(b, y)
            return seq.states(), y
        st = init_states(blocks)
        return scan_time(step, st, x_in, reduce=reduce)

    # cumulative prefixes so we can difference stage costs
    names = ["resamp", "chan_filter", "quad", "shaping", "symbol_sync"]
    blocks = [fsk.resamp, fsk.chan_filter, fsk.quad, fsk.shaping,
              fsk.symbol_sync]

    def red_any(o):
        if isinstance(o, IqPair):
            return jnp.sum(o.re)
        return jnp.sum(o.real) if jnp.iscomplexobj(o) else jnp.sum(o)

    prev = 0.0
    for i in range(1, len(blocks) + 1):
        dt = stage_time(blocks[:i], x0, red_any) - floor
        print(json.dumps({"stage": f"prefix:{'+'.join(names[:i])}",
                          "ms": round(dt * 1e3, 3),
                          "delta_ms": round((dt - prev) * 1e3, 3)}),
              flush=True)
        prev = dt

    # full chain (adds fec_tail)
    dt = scan_time(lambda s, x: fsk(s, x), fsk.init_state(), x0,
                   reduce=lambda o: jnp.sum(o["symbols"])) - floor
    print(json.dumps({"stage": "full_fsk_group", "ms": round(dt * 1e3, 3),
                      "delta_fec_tail_ms": round((dt - prev) * 1e3, 3)}),
          flush=True)

    # NBFM group breakdown
    nb = NbfmDemod(lead_shape=(half,))
    dt = scan_time(lambda s, x: nb(s, x), nb.init_state(), x0,
                   reduce=lambda o: jnp.sum(o["audio"])) - floor
    print(json.dumps({"stage": "full_nbfm_group", "ms": round(dt * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    main()
