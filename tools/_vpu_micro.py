"""Microbenchmark of elementary Pallas VPU op costs on this chip (dev probe).

Each op runs R times inside one kernel via lax.fori_loop with a serial
carry (Mosaic cannot eliminate or overlap iterations); cost = slope between
R_lo and R_hi. R_hi is large enough that the delta (~ms) dwarfs the tunnel
round-trip noise. Establishes the per-pass cost model used to pick round-3
kernel restructures. Shapes mirror the scan kernel's working set.
"""
import functools
import sys, time
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

N, FT = 5184, 128
rng = np.random.default_rng(0)
x0 = jax.device_put(rng.normal(size=(N, FT)).astype(np.float32) * 0.01)
y0 = jax.device_put(rng.normal(size=(N, FT)).astype(np.float32) * 0.01)


def timed_call(f, *args, iters=5):
    float(np.asarray(f(*args)).ravel()[0])
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        float(np.asarray(f(*args)).ravel()[0])
        ts.append(time.perf_counter() - t0)
    return min(ts)


R_LO, R_HI = 32, 288


def bench(name, body, out_rows=N, x=None, y=None):
    """body(x, y) -> (out_rows, FT) f32; looped with a scalar carry folded
    into x to serialize iterations."""
    xa = x0 if x is None else x
    ya = y0 if y is None else y
    def make(r):
        def kernel(x_ref, y_ref, o_ref):
            x = x_ref[:, :]
            y = y_ref[:, :]
            def it(i, carry):
                out = body(x + carry * 1e-20, y)
                return out[0, 0]
            c = jax.lax.fori_loop(0, r, it, jnp.float32(0.0))
            o_ref[:, :] = body(x + c * 1e-20, y)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return jax.jit(lambda x, y: pl.pallas_call(
            kernel,
            in_specs=[vspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((out_rows, FT), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x, y))
    t = (timed_call(make(R_HI), xa, ya)
         - timed_call(make(R_LO), xa, ya)) / (R_HI - R_LO)
    print(f"{name:30s} {t*1e6:8.2f} us/op", flush=True)
    return t


bench("add2", lambda x, y: x + y)
bench("mul_add", lambda x, y: x * y + x)
bench("cplx_mul_half", lambda x, y: x * y - y * x * 0.5)
bench("roll337_sub", lambda x, y: pltpu.roll(x, 337, 0))
bench("roll337+add", lambda x, y: pltpu.roll(x, 337, 0) + y)
bench("roll864_sub", lambda x, y: pltpu.roll(x, 864, 0))
bench("roll1_lane", lambda x, y: pltpu.roll(x, 1, 1))
bench("where_lane_sel", lambda x, y: jnp.where(
    jax.lax.broadcasted_iota(jnp.int32, (N, FT), 1) < 64, x, y))
bench("tanh", lambda x, y: jnp.tanh(x))


def sq_slicemax(x, y):
    xb = x * x
    outs = []
    for s in range(20):
        outs.append(jnp.max(xb[s * 256:(s + 1) * 256, :], axis=0,
                            keepdims=True))
    outs.append(jnp.max(xb[5120:, :], axis=0, keepdims=True))
    return jnp.concatenate(outs, axis=0)
bench("sq+21slicemax", sq_slicemax, out_rows=21)


def sq_slicemax_arg(x, y):
    xb = x * x
    outs = []
    for s in range(20):
        seg = xb[s * 256:(s + 1) * 256, :]
        outs.append(jnp.max(seg, axis=0, keepdims=True))
        outs.append(jnp.argmax(seg, axis=0).astype(jnp.float32)[None, :])
    seg = xb[5120:, :]
    outs.append(jnp.max(seg, axis=0, keepdims=True))
    outs.append(jnp.argmax(seg, axis=0).astype(jnp.float32)[None, :])
    return jnp.concatenate(outs, axis=0)
bench("sq+21max+argmax", sq_slicemax_arg, out_rows=42)

# block-sum alternative: 6 static 864-row block adds (no roll)
def block_add(x, y):
    outs = []
    for b in range(6):
        outs.append(x[b * 864:(b + 1) * 864, :] + y[((b + 1) % 6) * 864:
                                                    (((b + 1) % 6) + 1) * 864, :])
    return jnp.concatenate(outs, axis=0)
bench("6x864_block_add", block_add)


def bench_mm(name, m, k, n, prec, reps=(8, 72)):
    a0 = jax.device_put(rng.normal(size=(m, k)).astype(np.float32) * 0.01)
    b0 = jax.device_put(rng.normal(size=(k, n)).astype(np.float32) * 0.01)
    def make(r):
        def kernel(a_ref, b_ref, o_ref):
            a = a_ref[:, :]
            b = b_ref[:, :]
            def it(i, carry):
                out = jnp.dot(a + carry * 1e-20, b,
                              preferred_element_type=jnp.float32,
                              precision=prec)
                return out[0, 0]
            c = jax.lax.fori_loop(0, r, it, jnp.float32(0.0))
            o_ref[:, :] = jnp.dot(a + c * 1e-20, b,
                                  preferred_element_type=jnp.float32,
                                  precision=prec)
        vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
        return jax.jit(lambda a, b: pl.pallas_call(
            kernel,
            in_specs=[vspec, vspec],
            out_specs=vspec,
            out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(a, b))
    r_lo, r_hi = reps
    t = (timed_call(make(r_hi), a0, b0)
         - timed_call(make(r_lo), a0, b0)) / (r_hi - r_lo)
    fl = 2 * m * k * n
    print(f"{name:30s} {t*1e6:8.2f} us/op  {fl/t/1e12:6.2f} TFLOP/s",
          flush=True)


bench_mm("mm (5184,48)x(48,128) HI", N, 48, FT, jax.lax.Precision.HIGHEST)
bench_mm("mm (5184,48)x(48,128) DEF", N, 48, FT, jax.lax.Precision.DEFAULT)
bench_mm("mm (1024,96)x(96,2048) DEF", 1024, 96, 2048,
         jax.lax.Precision.DEFAULT)
bench_mm("mm (512,512)x(512,128) DEF", 512, 512, FT,
         jax.lax.Precision.DEFAULT)
bench_mm("mm (648,64)x(64,128) DEF", 648, 64, FT, jax.lax.Precision.DEFAULT,
         reps=(32, 288))
