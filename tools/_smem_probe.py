import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
mode = sys.argv[1]
# grid of 4 steps; each reads pos[fidx*2+1] dynamically and rolls by it
def k(pos_ref, x_ref, o_ref):
    fidx = pl.program_id(0)
    if mode == 'dyn':
        sh = pos_ref[fidx * 2 + 1]
    else:
        sh = pos_ref[1]
    o_ref[:] = pltpu.roll(x_ref[:], -sh, 1)[:, :256]
x = np.arange(8*1024, dtype=np.float32).reshape(8, 1024)
pos = np.arange(8, dtype=np.int32) * 3
gs = pltpu.PrefetchScalarGridSpec(
    num_scalar_prefetch=1, grid=(4,),
    in_specs=[pl.BlockSpec((8, 1024), lambda f, *_: (0, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((8, 256), lambda f, *_: (f, 0), memory_space=pltpu.VMEM))
out = pl.pallas_call(k, grid_spec=gs,
    out_shape=jax.ShapeDtypeStruct((32, 256), jnp.float32))(pos, x)
out = np.asarray(out)
ok = True
for f in range(4):
    sh = pos[f*2+1] if mode == 'dyn' else pos[1]
    want = np.roll(x, -sh, 1)[:, :256]
    ok &= np.array_equal(out[f*8:(f+1)*8], want)
print(f'smem {mode} read + roll:', 'OK' if ok else 'WRONG', flush=True)
