"""Round-4 BP kernel timing on TPU: flat-batched Pallas BP (the wired path),
fast vs exact, after the GRPSUM/PARCRC matmul fusions. Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import pallas_ldpc

B, K = 16, 512
rng = np.random.default_rng(0)
llr = jax.device_put(rng.normal(0, 2, (B * K, 128)).astype(np.float32))
valid = jax.device_put(np.ones((B * K,), bool))
print(f"device={jax.devices()[0]} B={B} K={K} (flat {B*K} rows)", flush=True)

def loop_time(fast, n_lo=16, n_hi=144, iters=7):
    @jax.jit
    def run_n(n_static, ll):
        def body(i, s):
            r = pallas_ldpc.bp_decode_pallas(ll + s, valid, fast_math=fast)
            return jnp.sum(r.iterations.astype(jnp.float32)) * 1e-30
        return jax.lax.fori_loop(0, n_static, body, 0.0)
    times = {}
    for n in (n_lo, n_hi):
        f = jax.jit(lambda ll, n=n: run_n(n, ll))
        float(f(llr))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(f(llr)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

for fast in (True, False):
    t = loop_time(fast)
    print(f"bp pallas fast={fast}: {t/B*1e3:7.3f} ms/win", flush=True)
