import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.ops import pallas_demod
rng = np.random.default_rng(0)
F, Pn = 64, 6
za = jnp.asarray((rng.normal(0,1,(F,Pn,C.WINDOW_LEN))+1j*rng.normal(0,1,(F,Pn,C.WINDOW_LEN))).astype(np.complex64))
pos = jnp.asarray(rng.integers(0, C.WINDOW_LEN, (F,Pn,8)).astype(np.int32))
print('calling demod_pallas directly (no jit)...', flush=True)
try:
    sb, nbad = pallas_demod.demod_pallas(za, pos)
    s = np.asarray(sb).sum()
    n = np.asarray(nbad).sum()
    print(f'direct call OK sb.sum={s:.3f} nbad.sum={n}', flush=True)
except Exception as e:
    print(f'direct call FAIL: {type(e).__name__} {str(e)[:200]}', flush=True)
    # bisect the wrapper: run the kernel with wrapper-prepared numpy inputs
    za_ext = np.concatenate([np.asarray(za), np.asarray(za)[..., :863],
                             np.zeros((F,Pn,97), np.complex64)], axis=-1)
    za_ext = np.concatenate([za_ext, np.zeros((F, 2, 6144), np.complex64)], axis=1)
    print('wrapper arrays built on host OK', flush=True)
