import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 501
xg = (np.arange(F*8*6144, dtype=np.int64) % 977).astype(np.float32).reshape(F*8, 6144)
pos = ((np.arange(F*48, dtype=np.int32) * 97) % 5184)
pos_vmem = np.zeros((F*8, 128), np.int32)
for f in range(F):
    pos_vmem[f*8, :48] = pos[f*48:(f+1)*48]

def kG(x_ref, p_ref, o_ref):
    rows = []
    for p in range(6):
        for k in range(8):
            start = p_ref[0, p * 8 + k]
            q = pl.multiple_of((start // 128) * 128, 128)
            r = start - q
            rows.append(pltpu.roll(x_ref[p : p + 1, pl.ds(q, 1024)], -r, 1)[:, :864])
    fr = jnp.concatenate(rows, axis=0)
    o_ref[:, :] = fr[:, :128]

t0 = time.perf_counter()
out = pl.pallas_call(kG,
    grid=(F,),
    in_specs=[pl.BlockSpec((8, 6144), lambda f: (f, 0), memory_space=pltpu.VMEM),
              pl.BlockSpec((8, 128), lambda f: (f, 0), memory_space=pltpu.VMEM)],
    out_specs=pl.BlockSpec((48, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
    out_shape=jax.ShapeDtypeStruct((F*48, 128), jnp.float32))(xg, pos_vmem)
d = np.asarray(out)
print(f'G vmem-pos F=501: RAN ({time.perf_counter()-t0:.0f}s)', flush=True)
want = np.stack([xg[f*8 + p, pos[f*48+p*8+k]:pos[f*48+p*8+k]+128]
                 for f in range(F) for p in range(6) for k in range(8)])
print('G correct:', np.array_equal(d, want), flush=True)
