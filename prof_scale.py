import time, numpy as np, jax, jax.numpy as jnp
from qradiolink_tpu.chains.fsk import Fsk4DemodFF
from qradiolink_tpu.core import device_init_state, put_iq

def bench(n_ch, t, n=10):
    chain = Fsk4DemodFF(lead_shape=(n_ch,))
    state = device_init_state(chain)
    rng = np.random.default_rng(0)
    iq = put_iq((rng.standard_normal((n_ch, t)) + 1j*rng.standard_normal((n_ch, t))).astype(np.complex64)*0.1)
    step = jax.jit(lambda s, x: chain(s, x))
    fence = jax.jit(lambda o: jnp.sum(o["symbols"]).astype(jnp.float32))
    st, out = step(state, iq); float(fence(out))
    t0 = time.perf_counter()
    for _ in range(n):
        st, out = step(st, iq)
    float(fence(out))
    dt = (time.perf_counter()-t0)/n
    print(f"n_ch={n_ch:4d} t={t:7d}: {dt*1e3:7.2f} ms/step  {n_ch*t/dt/1e6:8.1f} Msps  ({n_ch*t/dt/1e6/n_ch:.1f}x rt/ch)", flush=True)

bench(64, 200_000)

bench(256, 200_000)
