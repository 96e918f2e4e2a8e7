import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.ops import pallas_demod as PD
rng = np.random.default_rng(0)
F, Pn, pp = 64, 6, 8
R = 48
za = jnp.asarray((rng.normal(0,1,(F,Pn,C.WINDOW_LEN))+1j*rng.normal(0,1,(F,Pn,C.WINDOW_LEN))).astype(np.complex64))
pos = jnp.asarray(rng.integers(0, C.WINDOW_LEN, (F,Pn,8)).astype(np.int32))

def step(name, fn):
    try:
        out = fn()
        _ = [np.asarray(jnp.abs(o) if jnp.iscomplexobj(o) else o) for o in (out if isinstance(out, (list, tuple)) else [out])]
        print(f'{name}: OK', flush=True)
        return out
    except Exception as e:
        print(f'{name}: FAIL {type(e).__name__} {str(e)[:120]}', flush=True)
        raise SystemExit(1)

za_ext = step('za_ext concat', lambda: jnp.concatenate(
    [za, za[..., : 863], jnp.zeros(za.shape[:-1] + (PD._EXT_PAD - PD._EXT,), za.dtype)], axis=-1))
za_ext2 = step('pattern pad', lambda: jnp.concatenate(
    [za_ext, jnp.zeros((F, pp - Pn, PD._EXT_PAD), za_ext.dtype)], axis=1))
za2_re = step('real reshape', lambda: za_ext2.real.reshape(F * pp, PD._EXT_PAD))
za2_im = step('imag reshape', lambda: za_ext2.imag.reshape(F * pp, PD._EXT_PAD))
pos_vmem = step('pos scatter', lambda: jnp.zeros((F, pp, 128), jnp.int32).at[:, 0, :R].set(pos.reshape(F, R)).reshape(F * pp, 128))

# now the pallas call with these exact traced-then-materialized arrays
za2_re = jnp.asarray(np.asarray(za2_re)); za2_im = jnp.asarray(np.asarray(za2_im))
pos_vmem = jnp.asarray(np.asarray(pos_vmem))
M = PD._demod_matrix(); P_q, P_i, DSEL = PD._sb_maps()
kernel = __import__('functools').partial(PD._demod_kernel, Pn)
const = lambda r, c: pl.BlockSpec((r, c), lambda f, *_: (0, 0), memory_space=pltpu.VMEM)
def call():
    return pl.pallas_call(
        kernel, grid=(F,),
        in_specs=[pl.BlockSpec((pp, PD._EXT_PAD), lambda f: (f, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((pp, PD._EXT_PAD), lambda f: (f, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((pp, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
                  const(864, 256), const(72, 256), const(72, 256), const(144, 128), const(8, 256)],
        out_specs=[pl.BlockSpec((R, 128), lambda f: (f, 0), memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((F * R, 128), jnp.float32),
                   jax.ShapeDtypeStruct((F * R, 128), jnp.int32)],
    )(za2_re, za2_im, pos_vmem, M, P_q, P_i, DSEL, PD._sync_sign())
step('pallas call (host-materialized inputs)', call)
