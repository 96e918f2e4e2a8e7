"""Preprocess stage microbench: which part of analytic method 2 is slow on
TPU. Loop method (fori_loop in one jit, scalar digest fetch). Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.ops import analytic

B = 16
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
rawf = jax.device_put(np.asarray(raw, np.float32))
print(f"device={jax.devices()[0]} B={B}", flush=True)


def loop_time(fn, x, n_lo=4, n_hi=32, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0):
            def body(i, s):
                r = fn(x + s.astype(x.dtype))
                # full-array digest: a sliced digest lets XLA DCE the FIR
                return jnp.sum(jnp.abs(r)).astype(jnp.float32) * 1e-30
            return jax.lax.fori_loop(0, n, lambda i, s: body(i, s), s0)
        ts = []
        float(run(0.0))
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(0.0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


left, right = analytic._shift_tables()
# complex host->device transfer is UNIMPLEMENTED over the axon tunnel;
# keep numpy so jit embeds them as constants
leftj = left
rightj = right


def full(x):
    return analytic.analytic_method2(analytic.rms_normalize(x))

def cast_only(x):
    return (x.astype(jnp.float32) * 1.0).astype(jnp.complex64)

def rms_only(x):
    return analytic.rms_normalize(x).astype(jnp.complex64)

def shift_only(x):
    z = analytic._pad(x.astype(jnp.float32)).astype(jnp.complex64)
    return z * leftj

def fir_fwd(x):
    z = analytic._pad(x.astype(jnp.float32)).astype(jnp.complex64)
    return analytic._fir_forward(z)

def fir_both(x):
    z = analytic._pad(x.astype(jnp.float32)).astype(jnp.complex64)
    return analytic._fir_backward(analytic._fir_forward(z))

def no_rms(x):
    return analytic.analytic_method2(x.astype(jnp.float32))


for name, fn, x in [
    ("cast int16->f32", cast_only, raw),
    ("rms_normalize", rms_only, raw),
    ("pad+shift", shift_only, rawf),
    ("pad+fir fwd", fir_fwd, rawf),
    ("pad+fir both", fir_both, rawf),
    ("method2 (no rms)", no_rms, rawf),
    ("rms+method2 f32 in", full, rawf),
    ("rms+method2 i16 in", full, raw),
]:
    t = loop_time(fn, x)
    print(f"{name:20s}: {t/B*1e3:7.3f} ms/win", flush=True)
