import sys; sys.path.insert(0, "/root/repo")
import os, numpy as np, time
import jax, jax.numpy as jnp
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.ops import pallas_demod
stage = sys.argv[1]
os.environ["MSK144_DEMOD_STAGE"] = stage
rng = np.random.default_rng(0)
F, Pn = 64, 6
za = jnp.asarray((rng.normal(0,1,(F,Pn,C.WINDOW_LEN))+1j*rng.normal(0,1,(F,Pn,C.WINDOW_LEN))).astype(np.complex64))
pos = jnp.asarray(rng.integers(0, C.WINDOW_LEN, (F,Pn,8)).astype(np.int32))
f = jax.jit(lambda z, p: sum(jnp.sum(x.astype(jnp.float32)) for x in pallas_demod.demod_pallas(z, p)))
t0=time.perf_counter()
d = np.asarray(f(za, pos))
print(f'stage {stage}: OK ({time.perf_counter()-t0:.1f}s) digest={d:.3f}', flush=True)
