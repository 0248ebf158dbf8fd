import time, numpy as np, jax, jax.numpy as jnp
from qradiolink_tpu.chains.fsk import Fsk4DemodFF
from qradiolink_tpu.core import device_init_state, put_iq

print("platform:", jax.devices()[0].platform, flush=True)
n_ch, t = 64, 200_000
chain = Fsk4DemodFF(lead_shape=(n_ch,))
state = device_init_state(chain)
rng = np.random.default_rng(0)
iq = put_iq((rng.standard_normal((n_ch, t)) + 1j*rng.standard_normal((n_ch, t))).astype(np.complex64)*0.1)

# stage-wise jits
stages = {}
stages["resamp"] = jax.jit(lambda s, x: chain.resamp(s[0], x))
stages["chan_filter"] = jax.jit(lambda s, x: chain.chan_filter(s[1], x))
stages["quad"] = jax.jit(lambda s, x: chain.quad(s[2], x))
stages["shaping"] = jax.jit(lambda s, x: chain.shaping(s[3], x))
stages["symbol_sync"] = jax.jit(lambda s, x: chain.symbol_sync(s[4], x))
stages["fec_tail"] = jax.jit(lambda s, x: chain.fec_tail(s[5], x))
full = jax.jit(lambda s, x: chain(s, x))
fence = jax.jit(lambda o: jnp.sum(jnp.abs(o)).astype(jnp.float32) if jnp.iscomplexobj(o) else jnp.sum(o.astype(jnp.float32)))

def timeit(name, fn, s, x, n=10):
    out = fn(s, x)
    y = out[1]
    if isinstance(y, dict): y = y["symbols"]
    float(fence(y))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(s, x)
    y = out[1]
    if isinstance(y, dict): y = y["symbols"]
    float(fence(y))
    dt = (time.perf_counter()-t0)/n
    print(f"{name:14s} {dt*1e3:8.2f} ms", flush=True)
    return out

x = iq
o = timeit("resamp", stages["resamp"], state, x); x1 = o[1]
o = timeit("chan_filter", stages["chan_filter"], state, x1); x2 = o[1]
o = timeit("quad", stages["quad"], state, x2); x3 = o[1]
o = timeit("shaping", stages["shaping"], state, x3); x4 = o[1]
o = timeit("symbol_sync", stages["symbol_sync"], state, x4); x5 = o[1]
o = timeit("fec_tail", stages["fec_tail"], state, x5)
timeit("FULL", full, state, iq)
# empty roundtrip cost
nul = jax.jit(lambda x: (None, x*1.0))
timeit("noop", lambda s, x: nul(x), None, iq)
