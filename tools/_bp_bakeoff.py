"""XLA-batched vs Pallas BP at configurable batch (loop method). Dev probe."""
import os, sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import ldpc, pallas_ldpc

B = int(os.environ.get("PB", 64))
K = 512
rng = np.random.default_rng(0)
llr = jax.device_put(rng.normal(0, 2, (B, K, 128)).astype(np.float32))
valid = jax.device_put(np.ones((B, K), bool))
print(f"device={jax.devices()[0]} B={B} K={K}", flush=True)

def loop_time(fn, n_lo=2, n_hi=8, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(ll, s0):
            def body(i, s):
                r = fn(ll + s)
                return s + (r.iterations[0, 0] % 2).astype(jnp.float32) * 1e-6
            return jax.lax.fori_loop(0, n, body, s0)
        float(run(llr, 0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(llr, 0.0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

t_x = loop_time(lambda l: jax.vmap(lambda a: ldpc.bp_decode(a, valid[0]))(l))
print(f"xla  bp: {t_x/B*1e3:7.3f} ms/win", flush=True)
t_p = loop_time(lambda l: jax.vmap(lambda a: pallas_ldpc.bp_decode_pallas(a, valid[0]))(l))
print(f"plas bp: {t_p/B*1e3:7.3f} ms/win", flush=True)
