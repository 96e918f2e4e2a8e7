import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
rows, cols = int(sys.argv[1]), int(sys.argv[2])
def k(x_ref, s_ref, o_ref):
    sh = s_ref[0]
    o_ref[:] = pltpu.roll(x_ref[:], -sh, 1)[:, :256]
x = np.arange(rows*cols, dtype=np.float32).reshape(rows, cols)
f = jax.jit(lambda x, s: pl.pallas_call(k,
    in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
    out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((rows,256), jnp.float32),
)(x, s))
for shift in [0, 5, 127, 128, 300, 511, 512, 1000, 2048, 4321, 5183]:
    if shift >= cols: continue
    out = np.asarray(f(x, np.array([shift], np.int32)))
    want = np.roll(x, -shift, 1)[:, :256]
    print(f'({rows},{cols}) shift={shift}: {"OK" if np.array_equal(out, want) else "WRONG"}', flush=True)
