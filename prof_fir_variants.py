import time, numpy as np, jax, jax.numpy as jnp
from jax import lax
from qradiolink_tpu.ops import firdes

C2, T, D = 128, 200_000, 50
taps = firdes.low_pass(1.0, 1_000_000, 10_000, 10_000, firdes.WIN_BLACKMAN_HARRIS)
K = len(taps); n_out = T // D; F = -(-K // D); KPAD = F * D
tf = np.zeros(KPAD, np.float32); tf[:K] = taps[::-1]
H = tf.reshape(F, D)                      # h_f rows
rng = np.random.default_rng(0)
x = rng.standard_normal((C2, (n_out + F) * D)).astype(np.float32)
xd = jnp.asarray(x)
fence = jax.jit(lambda y: jnp.sum(y).astype(jnp.float32))

def timeit(name, fn, n=10):
    y = fn(xd); float(fence(y))
    t0 = time.perf_counter()
    for _ in range(n): y = fn(xd)
    float(fence(y))
    print(f"{name:12s} {(time.perf_counter()-t0)/n*1e3:8.2f} ms", flush=True)
    return np.asarray(y)

from qradiolink_tpu.ops.fir import conv1d_valid
@jax.jit
def v_slices(x2):
    return conv1d_valid(x2[:, :T + K - 1], jnp.asarray(taps), stride=D)

@jax.jit
def v_conv(x2):
    xb = x2[:, :T + K - 1].reshape(C2, 1, -1)
    rhs = jnp.asarray(tf[:K][None, None, :])  # flipped taps
    y = lax.conv_general_dilated(xb, rhs, window_strides=(D,), padding="VALID",
                                 dimension_numbers=("NCW","OIW","NCW"))
    return y.reshape(C2, -1)

@jax.jit
def v_frames(x2):
    xf = x2.reshape(C2, n_out + F, D)          # frames [c, n, r]
    Hj = jnp.asarray(H)
    acc = jnp.einsum('cnr,r->cn', lax.dynamic_slice_in_dim(xf, 0, n_out, 1), Hj[0])
    for f in range(1, F):
        acc = acc + jnp.einsum('cnr,r->cn',
                               lax.dynamic_slice_in_dim(xf, f, n_out, 1), Hj[f])
    return acc

# pallas variant: grid over (C2/8, n_out/512), double-block input
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
CT, NT = 8, 500
n_blocks = n_out // NT                      # 8
Hc = H  # (F, D)

def kernel(a_ref, b_ref, o_ref):
    xcat = jnp.concatenate([a_ref[:], b_ref[:, :F, :]], axis=1)  # (CT, NT+F, D)
    acc = jnp.zeros((CT, NT), jnp.float32)
    for f in range(F):
        slab = xcat[:, f:f+NT, :]           # (CT, NT, D)
        for r in range(D):
            h = float(Hc[f, r])
            if h == 0.0: continue
            acc = acc + h * slab[:, :, r]
    o_ref[:] = acc

@jax.jit
def v_pallas(x2):
    xf = x2.reshape(C2, n_out + F, D)
    # pad frames so block j+1 exists for the last j
    pad = (n_blocks + 1) * NT - (n_out + F)
    xf = jnp.pad(xf, ((0,0),(0,pad),(0,0)))
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((C2, n_out), jnp.float32),
        grid=(C2 // CT, n_blocks),
        in_specs=[
            pl.BlockSpec((CT, NT, D), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CT, NT, D), lambda i, j: (i, j + 1, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((CT, NT), lambda i, j: (i, j), memory_space=pltpu.VMEM),
    )(xf, xf)

want = None
for name, fn in (("frames", v_frames), ("pallas", v_pallas)):
    try:
        y = timeit(name, fn)
        if want is None:
            want = y[:2, :200]
        else:
            err = np.abs(y[:2, :200] - want).max()
            print(f"   {name} max err vs slices: {err:.2e}", flush=True)
    except Exception as e:
        print(f"{name} FAILED: {str(e)[:200]}", flush=True)
