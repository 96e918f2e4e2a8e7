import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
mode = sys.argv[1]
if mode == 'roll1':
    def k(x_ref, s_ref, o_ref):
        sh = s_ref[0]
        o_ref[:] = pltpu.roll(x_ref[:], -sh, 1)[:, :256]
    x = np.arange(1024, dtype=np.float32).reshape(1, 1024)
    f = lambda s: pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1,256), jnp.float32))(x, np.array([s], np.int32))
    for s in [0, 5, 127]:
        out = np.asarray(f(s)); want = np.roll(x, -s, 1)[:, :256]
        print(f'(1,1024) roll {s}:', 'OK' if np.array_equal(out, want) else 'WRONG', flush=True)
elif mode == 'slice':
    def k(x_ref, s_ref, o_ref):
        start = s_ref[0]
        q = pl.multiple_of((start // 128) * 128, 128)
        o_ref[:] = x_ref[0:1, pl.ds(q, 1024)]
    x = np.arange(8*6144, dtype=np.float32).reshape(8, 6144)
    f = lambda s: pl.pallas_call(k,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1,1024), jnp.float32))(x, np.array([s], np.int32))
    for s in [0, 130, 5120, 5183]:
        out = np.asarray(f(s)); q = (s//128)*128; want = x[0:1, q:q+1024]
        print(f'(8,6144) aligned slice start={s}:', 'OK' if np.array_equal(out, want) else 'WRONG', flush=True)
