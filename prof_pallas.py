import numpy as np, jax, jax.numpy as jnp, time
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2.0 + 1.0

@jax.jit
def double(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.asarray(np.ones((8, 128), np.float32))
y = double(x)
print("pallas basic:", float(jnp.sum(y)))

# grid + tiled version
def k2(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 3.0

@jax.jit
def triple(x):
    return pl.pallas_call(
        k2,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(x.shape[0] // 8,),
        in_specs=[pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((8, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)

x2 = jnp.asarray(np.ones((64, 128), np.float32))
print("pallas grid:", float(jnp.sum(triple(x2))))
