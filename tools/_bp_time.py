"""BP decode timing on TPU (loop method). Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import ldpc

B, K = 16, 512
rng = np.random.default_rng(0)
llr = jax.device_put(rng.normal(0, 2, (B, K, 128)).astype(np.float32))
valid = jax.device_put(np.ones((B, K), bool))
print(f"device={jax.devices()[0]} B={B} K={K}", flush=True)

fn = jax.jit(jax.vmap(lambda l, v: ldpc.bp_decode(l, v)))

def loop_time(n_lo=4, n_hi=16, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(ll, s0):
            def body(i, s):
                r = fn(ll + s, valid)
                return jnp.sum(r.iterations[:, 0].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        float(run(llr, 0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(llr, 0.0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

t = loop_time()
print(f"bp: {t/B*1e3:7.3f} ms/win", flush=True)
