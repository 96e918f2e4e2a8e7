"""Batch-slope timing: t(B_hi) - t(B_lo) per call cancels dispatch overhead.
Cross-check against the fori_loop method. Dev probe."""
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
rng = np.random.default_rng(0)
print(f"device={jax.devices()[0]}", flush=True)

def timed(fn, x, iters=6):
    jax.block_until_ready(fn(x))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter(); jax.block_until_ready(fn(x))
        ts.append(time.perf_counter() - t0)
    return min(ts)

def slope(make_fn, B_lo=16, B_hi=64):
    res = {}
    for B in (B_lo, B_hi):
        raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
        c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
        fn = jax.jit(make_fn)
        res[B] = timed(fn, c)
    return (res[B_hi] - res[B_lo]) / (B_hi - B_lo), res

s, r = slope(lambda cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
    w, freqs, cfg.scan_depth))(cc)[1])
print(f"scan slope: {s*1e3:7.3f} ms/win  (t16={r[16]*1e3:.1f} ms t64={r[64]*1e3:.1f} ms)", flush=True)

def full(B):
    raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
    fn = lambda r_: pipeline.decode_raw(r_, cfg)
    return timed(fn, raw)
t16, t64 = full(16), full(64)
print(f"decode_raw slope: {(t64-t16)/48*1e3:7.3f} ms/win  (t16={t16*1e3:.1f} t64={t64*1e3:.1f})", flush=True)
