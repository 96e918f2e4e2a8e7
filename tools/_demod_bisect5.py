import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 64
xg = (np.arange(F*8*6144, dtype=np.int64) % 977).astype(np.float32).reshape(F*8, 6144)
pos = ((np.arange(F*48, dtype=np.int32) * 97) % 5184)
pos_vmem = np.zeros((F*8, 128), np.int32)
for f in range(F):
    pos_vmem[f*8, :48] = pos[f*48:(f+1)*48]
M = np.random.default_rng(0).normal(0,1,(864,256)).astype(np.float32)
PQ = np.random.default_rng(1).normal(0,1,(72,256)).astype(np.float32)
DSEL = np.random.default_rng(2).normal(0,1,(144,128)).astype(np.float32)
SS = np.random.default_rng(3).normal(0,1,(8,256)).astype(np.float32)

def extract(x_ref, p_ref):
    rows = []
    for p in range(6):
        for k in range(8):
            start = p_ref[0, p * 8 + k]
            q = pl.multiple_of((start // 128) * 128, 128)
            r = start - q
            rows.append(pltpu.roll(x_ref[p : p + 1, pl.ds(q, 1024)], -r, 1)[:, :864])
    return jnp.concatenate(rows, axis=0)

def blocked(shape):
    return pl.BlockSpec(shape, lambda f: (f, 0), memory_space=pltpu.VMEM)
def const(shape):
    return pl.BlockSpec(shape, lambda f: (0, 0), memory_space=pltpu.VMEM)

def run(name, kernel, in_specs, args, outs=1):
    try:
        t0 = time.perf_counter()
        out = pl.pallas_call(kernel, grid=(F,),
            in_specs=in_specs,
            out_specs=[blocked((48,128))]*outs if outs > 1 else blocked((48,128)),
            out_shape=[jax.ShapeDtypeStruct((F*48,128), jnp.float32)]*(outs-1)
                      + [jax.ShapeDtypeStruct((F*48,128), jnp.int32 if outs>1 else jnp.float32)]
                      if outs > 1 else jax.ShapeDtypeStruct((F*48,128), jnp.float32))(*args)
        leaves = out if isinstance(out, (list,tuple)) else [out]
        _ = [np.asarray(o) for o in leaves]
        print(f'{name}: RAN ({time.perf_counter()-t0:.0f}s)', flush=True)
        return True
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__} {str(e)[:100]}', flush=True)
        return False

# H: G + dual za inputs + dual outputs (no consts)
def kH(a_ref, b_ref, p_ref, o_ref, o2_ref):
    fr = extract(a_ref, p_ref)
    fi = extract(b_ref, p_ref)
    o_ref[:, :] = fr[:, :128]
    o2_ref[:, :] = fi[:, :128].astype(jnp.int32)
run('H dual-za dual-out', kH, [blocked((8,6144)), blocked((8,6144)), blocked((8,128))], (xg, xg, pos_vmem), outs=2)

# I: H + all five const inputs (unused)
def kI(a_ref, b_ref, p_ref, m_ref, pq_ref, pi_ref, d_ref, s_ref, o_ref, o2_ref):
    fr = extract(a_ref, p_ref)
    fi = extract(b_ref, p_ref)
    o_ref[:, :] = fr[:, :128]
    o2_ref[:, :] = fi[:, :128].astype(jnp.int32)
run('I + unused consts', kI,
    [blocked((8,6144)), blocked((8,6144)), blocked((8,128)),
     const((864,256)), const((72,256)), const((72,256)), const((144,128)), const((8,256))],
    (xg, xg, pos_vmem, M, PQ, PQ, DSEL, SS), outs=2)

# J: I + the matmul actually used
def kJ(a_ref, b_ref, p_ref, m_ref, pq_ref, pi_ref, d_ref, s_ref, o_ref, o2_ref):
    fr = extract(a_ref, p_ref)
    fi = extract(b_ref, p_ref)
    A = jnp.dot(fr, m_ref[:], preferred_element_type=jnp.float32)
    B = jnp.dot(fi, m_ref[:], preferred_element_type=jnp.float32)
    o_ref[:, :] = A[:, :128]
    o2_ref[:, :] = B[:, :128].astype(jnp.int32)
run('J + matmul', kJ,
    [blocked((8,6144)), blocked((8,6144)), blocked((8,128)),
     const((864,256)), const((72,256)), const((72,256)), const((144,128)), const((8,256))],
    (xg, xg, pos_vmem, M, PQ, PQ, DSEL, SS), outs=2)
