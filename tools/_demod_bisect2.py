import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 8
x = np.arange(8*6144, dtype=np.float32).reshape(8, 6144)
pos = (np.arange(F*48, dtype=np.int32) * 97) % 5184

def run(name, kernel, nout_rows):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(F,),
        in_specs=[pl.BlockSpec((8, 6144), lambda f, *_: (0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nout_rows, 128), lambda f, *_: (f, 0), memory_space=pltpu.VMEM))
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(kernel, grid_spec=gs,
            out_shape=jax.ShapeDtypeStruct((F*nout_rows, 128), jnp.float32))(pos, x)
        d = np.asarray(out)
        print(f'{name}: RAN ({time.perf_counter()-t0:.0f}s) sum={d.sum():.0f}', flush=True)
        return d
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:160]}', flush=True)
        return None

# A: dynamic smem read only (no roll): slice at aligned pos, store 128 lanes
def kA(pos_ref, x_ref, o_ref):
    fidx = pl.program_id(0)
    rows = []
    for k in range(8):
        start = pos_ref[fidx * 48 + k]
        q = pl.multiple_of((start // 128) * 128, 128)
        rows.append(x_ref[0:1, pl.ds(q, 1024)][:, :128])
    o_ref[:, :] = jnp.concatenate(rows, axis=0)
dA = run('A dyn-smem + aligned slice + concat8', kA, 8)
if dA is not None:
    want = np.stack([x[0, (pos[f*48+k]//128)*128:(pos[f*48+k]//128)*128+128] for f in range(F) for k in range(8)])
    print('A correct:', np.array_equal(dA, want.reshape(F*8,128)), flush=True)

# B: add residual roll
def kB(pos_ref, x_ref, o_ref):
    fidx = pl.program_id(0)
    rows = []
    for k in range(8):
        start = pos_ref[fidx * 48 + k]
        q = pl.multiple_of((start // 128) * 128, 128)
        r = start - q
        rows.append(pltpu.roll(x_ref[0:1, pl.ds(q, 1024)], -r, 1)[:, :128])
    o_ref[:, :] = jnp.concatenate(rows, axis=0)
dB = run('B + residual roll', kB, 8)
if dB is not None:
    want = np.stack([x[0, pos[f*48+k]:pos[f*48+k]+128] for f in range(F) for k in range(8)])
    print('B correct:', np.array_equal(dB, want.reshape(F*8,128)), flush=True)

# C: 48 candidates like the real kernel
def kC(pos_ref, x_ref, o_ref):
    fidx = pl.program_id(0)
    rows = []
    for k in range(48):
        start = pos_ref[fidx * 48 + k]
        q = pl.multiple_of((start // 128) * 128, 128)
        r = start - q
        rows.append(pltpu.roll(x_ref[0:1, pl.ds(q, 1024)], -r, 1)[:, :128])
    o_ref[:, :] = jnp.concatenate(rows, axis=0)
dC = run('C 48-way', kC, 48)
if dC is not None:
    want = np.stack([x[0, pos[f*48+k]:pos[f*48+k]+128] for f in range(F) for k in range(48)])
    print('C correct:', np.array_equal(dC, want.reshape(F*48,128)), flush=True)
