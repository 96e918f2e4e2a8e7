"""Stage bisect of the v2 demod kernel on real TPU: times the kernel with
stages disabled via pallas_demod._debug_skip. Dev probe, results feed the
kernel optimization; see tools/README.md."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan, pallas_demod

import os
K = int(os.environ.get("BISECT_K", "8"))
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512,
                    candidates_per_pattern=K)
freqs = tuple(float(f) for f in cfg.freqs)
rng = np.random.default_rng(0)
b = 16
raw = jax.device_put(rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16))
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
pos, _ = jax.jit(jax.vmap(lambda w: pallas_scan.scan_pallas(w, freqs, cfg.scan_depth, num_cand=K)))(c)
jax.block_until_ready((c, pos))

def fetch(x): return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

def loop_time(n_lo, n_hi, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0, cc, pp):
            def body(i, s):
                sb = jax.vmap(lambda w, p_: pallas_demod.demod_pallas(
                    w, freqs, p_))(cc + s.astype(jnp.complex64), pp)[0]
                return jnp.sum(sb[0, 0, 0, :8]) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        ts = []
        fetch(run(0.0, c, pos))
        for _ in range(iters):
            t0 = time.perf_counter(); fetch(run(0.0, c, pos)); ts.append(time.perf_counter()-t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

for skip in (("residual",), ("extract", "residual"),
             ("extract", "residual", "mf"),
             ("dance", "extract", "residual", "mf"), ()):
    pallas_demod._debug_skip = skip
    t = loop_time(2, 6)
    print(f"skip={skip!r:44s} {t/b*1e3:7.3f} ms/win", flush=True)
