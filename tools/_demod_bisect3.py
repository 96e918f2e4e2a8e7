import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 8
xg = np.arange(F*8*6144, dtype=np.float32).reshape(F*8, 6144) % 977
pos = ((np.arange(F*48, dtype=np.int32) * 97) % 5184)

def run(name, kernel, outs):
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(F,),
        in_specs=[pl.BlockSpec((8, 6144), lambda f, *_: (f, 0), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((48, 128), lambda f, *_: (f, 0), memory_space=pltpu.VMEM)] * outs)
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(kernel, grid_spec=gs,
            out_shape=[jax.ShapeDtypeStruct((F*48, 128), jnp.float32)] * (outs - 1)
                      + [jax.ShapeDtypeStruct((F*48, 128), jnp.int32 if outs > 1 else jnp.float32)])(pos, xg)
        d = [np.asarray(o) for o in (out if isinstance(out, (list, tuple)) else [out])]
        print(f'{name}: RAN ({time.perf_counter()-t0:.0f}s) sums={[float(x.sum()) for x in d]}', flush=True)
        return d
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__}: {str(e)[:140]}', flush=True)
        return None

def extract(pos_ref, x_ref, fidx):
    rows = []
    for p in range(6):
        for k in range(8):
            start = pos_ref[fidx * 48 + p * 8 + k]
            q = pl.multiple_of((start // 128) * 128, 128)
            r = start - q
            rows.append(pltpu.roll(x_ref[p : p + 1, pl.ds(q, 1024)], -r, 1)[:, :864])
    return jnp.concatenate(rows, axis=0)  # (48, 864)

# D: blocked per-f input, 6 pattern rows, 864-frame, single f32 out
def kD(pos_ref, x_ref, o_ref):
    fr = extract(pos_ref, x_ref, pl.program_id(0))
    o_ref[:, :] = fr[:, :128]
dD = run('D blocked-input 6-row 864-frame', kD, 1)
if dD is not None:
    want = np.stack([xg[f*8 + p, pos[f*48+p*8+k]:pos[f*48+p*8+k]+128]
                     for f in range(F) for p in range(6) for k in range(8)])
    print('D correct:', np.array_equal(dD[0], want), flush=True)

# E: + second int32 output via broadcast_to + astype
def kE(pos_ref, x_ref, o_ref, o2_ref):
    fr = extract(pos_ref, x_ref, pl.program_id(0))
    o_ref[:, :] = fr[:, :128]
    nb = jnp.sum(fr, axis=-1, keepdims=True)  # (48,1)
    o2_ref[:, :] = jnp.broadcast_to(nb, (48, 128)).astype(jnp.int32)
dE = run('E + int32 broadcast out', kE, 2)
