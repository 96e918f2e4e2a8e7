"""Does the scan correlation matmul cost scale with pass count or with
contraction depth on v5e? Times (R,42)@(42,F)x3 (Karatsuba shape) vs
(R,84)@(84,F)x2 (re/im stacked on the contraction axis) vs (R,126)@(126,F)x1
inside one Pallas kernel, bf16 operands. Decides whether the classic
4-mult->2-stacked-matmul form should replace Karatsuba. Dev probe."""
import sys, time, functools
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, ".")

R, F = 5248, 512  # scan shapes: lag rows x frequency tile
rng = np.random.default_rng(0)

def make(kd, np_):
    # DISTINCT operand pair per pass (identical dots get CSE'd away)
    a = jnp.asarray(rng.normal(0, 1, (np_, R, kd)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 1, (np_, kd, F)).astype(np.float32)).astype(jnp.bfloat16)
    def kern(a_ref, b_ref, o_ref):
        acc = jnp.zeros((R, F), jnp.float32)
        for p in range(np_):
            acc = acc + jnp.dot(a_ref[p, :, :], b_ref[p, :, :],
                                preferred_element_type=jnp.float32)
        o_ref[:, :] = acc
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )
    return jax.jit(lambda: jnp.sum(f(a, b)))

def loop_time(f, n_lo=32, n_hi=288, iters=5):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0, n=n):
            def body(i, s):
                return s + f() * 1e-30
            return jax.lax.fori_loop(0, n, body, 0.0)
        float(run(0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(0.0)); ts.append(time.perf_counter()-t0)
        times[n] = min(ts)
    return (times[n_hi]-times[n_lo])/(n_hi-n_lo)

print(f"device={jax.devices()[0]} R={R} F={F}", flush=True)
for kd, np_, tag in ((48, 3, "karatsuba 3x(K=48)"), (96, 2, "stacked  2x(K=96)"),
                     (144, 1, "single   1x(K=144)"), (48, 1, "one pass 1x(K=48)")):
    t = loop_time(make(kd, np_))
    print(f"{tag}: {t*1e6:8.1f} us/call", flush=True)

# re|im both from ONE pass: output axis doubled (N=2F), K=96
def make_wide(kd, nf):
    a = jnp.asarray(rng.normal(0, 1, (R, kd)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(0, 1, (kd, nf)).astype(np.float32)).astype(jnp.bfloat16)
    def kern(a_ref, b_ref, o_ref):
        o_ref[:, :] = jnp.dot(a_ref[:, :], b_ref[:, :],
                              preferred_element_type=jnp.float32)
    f = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((R, nf), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100*1024*1024),
    )
    return jax.jit(lambda: jnp.sum(f(a, b)))

for kd, nf, tag in ((96, 2*F, "wide-out 1x(K=96, N=1024)"),
                    (48, 2*F, "wide-out 1x(K=48, N=1024)"),
                    (96, 3*F, "wide-out 1x(K=96, N=1536)")):
    t = loop_time(make_wide(kd, nf))
    print(f"{tag}: {t*1e6:8.1f} us/call", flush=True)
