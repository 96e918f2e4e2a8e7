"""Scan kernel timing + TPU-vs-interpreter spot parity. Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan

cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
freqs = tuple(float(f) for f in cfg.freqs)
B = 16
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
print(f"device={jax.devices()[0]}", flush=True)

c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
scan_fn = jax.jit(lambda cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
    w, freqs, cfg.scan_depth))(cc))
pos, xb = scan_fn(c)
jax.block_until_ready((pos, xb))
np.savez("/tmp/scan_tpu.npz", pos=np.asarray(pos[0]), xb=np.asarray(xb[0]),
         c_re=np.asarray(c[0].real), c_im=np.asarray(c[0].im if hasattr(c[0], 'im') else c[0].imag))
print("dump written", flush=True)

def loop_time(n_lo=4, n_hi=16, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(cc, s0):
            def body(i, s):
                p_, x_ = scan_fn(cc + s.astype(jnp.complex64))
                return jnp.sum(x_[:, 0, 0, 0]) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        float(run(c, 0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(c, 0.0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

t = loop_time()
print(f"scan kernel: {t/B*1e3:7.3f} ms/win", flush=True)
