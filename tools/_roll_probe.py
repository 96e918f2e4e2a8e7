import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
shape = (int(sys.argv[1]), int(sys.argv[2]))
def k(x_ref, s_ref, o_ref):
    sh = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], -sh, 1)[:, :256]
x = np.arange(shape[0]*shape[1], dtype=np.float32).reshape(shape)
s = np.array([4321], np.int32)
out = pl.pallas_call(k,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((shape[0],256), jnp.float32),
)(x, s)
want = np.roll(x, -4321, 1)[:, :256]
print(f'{shape} dynamic roll ok:', np.array_equal(np.asarray(out), want))
