import time, numpy as np, jax, jax.numpy as jnp
t0=time.perf_counter()
x = jnp.ones((8,128), jnp.float32)
print("first op:", float(jnp.sum(x*2)), f"{time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
from qradiolink_tpu.ops.fir import _conv1d_real_frames
from qradiolink_tpu.ops import firdes
taps = firdes.low_pass(1.0, 1_000_000, 10_000, 10_000, firdes.WIN_BLACKMAN_HARRIS)
f = jax.jit(lambda x: _conv1d_real_frames(x, jnp.asarray(taps[::-1].copy()), 50))
xx = jnp.ones((128, 200_369), jnp.float32)
y = f(xx); float(jnp.sum(y))
print("frames fir compile+run:", f"{time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
for _ in range(10): y = f(xx)
float(jnp.sum(y))
print("frames fir steady:", f"{(time.perf_counter()-t0)/10*1e3:.2f} ms", flush=True)
