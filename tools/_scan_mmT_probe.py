"""Probe: transposed lag-matrix scan matmul variants on TPU (dev).

Tests whether Mosaic supports/likes dot_general contracting the sublane dim
of a (42, 5184) lhs (row-built, no gather), with operands pre-split to bf16
outside the kernel. Compares numerics + timing vs the current cmat gather +
in-kernel split2 path.
"""
import functools
import sys, time
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan
from msk144cudecoder_tpu.ops.tables import cached_freq_tables

_N = C.WINDOW_LEN
B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6)
freqs = tuple(float(f) for f in cfg.freqs)
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
jax.block_until_ready(c)
print(f"device={jax.devices()[0]} B={B}", flush=True)

L = C.SYNC_CORR_LEN  # 42


def lagT_planes(cw):
    """(6, 48, 5184) bf16: [crh, crl, cih, cil, cdh, cdl] row-built
    transposed lag matrices (cd = re - im), 42 rows padded to 48."""
    ext = jnp.concatenate([cw, cw[: L - 1]])
    er = ext.real
    ei = ext.imag
    ed = er - ei

    def rows(x):
        h = x.astype(jnp.bfloat16)
        l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
        out = []
        for part in (h, l):
            m = jnp.stack([part[i : i + _N] for i in range(L)])
            out.append(jnp.concatenate(
                [m, jnp.zeros((48 - L, _N), m.dtype)], axis=0))
        return out

    crh, crl = rows(er)
    cih, cil = rows(ei)
    cdh, cdl = rows(ed)
    return jnp.stack([crh, crl, cih, cil, cdh, cdl])


def bsplit(t):
    """Pre-split B tables: (bh, bl, bsh, bsl) with bs = br + bi."""
    Bt = np.asarray(t.B)

    def sp(x):
        h = x.astype(jnp.bfloat16)
        return h, (x - np.asarray(h, np.float32)).astype(jnp.bfloat16)

    brh, brl = sp(Bt.real.astype(np.float32))
    bih, bil = sp(Bt.imag.astype(np.float32))
    bsh, bsl = sp((Bt.real + Bt.imag).astype(np.float32))
    z = np.zeros((48 - L, Bt.shape[1]), np.float32)

    def pad(x):
        return np.concatenate([np.asarray(x, np.float32), z]).astype(jnp.bfloat16)

    return tuple(pad(x) for x in (brh, brl, bih, bil, bsh, bsl))


def _mmT_kernel(planes_ref, bh_r, bl_r, bih_r, bil_r, bsh_r, bsl_r,
                out_re, out_im):
    dn = (((0,), (0,)), ((), ()))
    bh, bl = bh_r[:, :], bl_r[:, :]
    bih, bil = bih_r[:, :], bil_r[:, :]
    bsh, bsl = bsh_r[:, :], bsl_r[:, :]

    def d(a, b):
        return jax.lax.dot_general(a, b, dimension_numbers=dn,
                                   preferred_element_type=jnp.float32)

    def mm(ah, al, xh, xl):
        return d(ah, xh) + d(ah, xl) + d(al, xh)

    crh, crl = planes_ref[0], planes_ref[1]
    cih, cil = planes_ref[2], planes_ref[3]
    cdh, cdl = planes_ref[4], planes_ref[5]
    m1 = mm(crh, crl, bh, bl)
    m2 = mm(cih, cil, bih, bil)
    m3 = mm(cdh, cdl, bsh, bsl)  # (cr-ci)@(br+bi)... with sign notes below
    out_re[:, :] = m1 + m2
    out_im[:, :] = m3 - m1 + m2


def run_mmT(cw):
    t = cached_freq_tables(freqs)
    f_total = t.B.shape[1]
    fp = f_total + (-f_total % 128)
    bt = bsplit(t)
    bt = tuple(jnp.asarray(np.concatenate(
        [np.asarray(x, np.float32),
         np.zeros((48, fp - f_total), np.float32)], axis=1).astype(jnp.bfloat16))
        for x in bt)
    planes = lagT_planes(cw)
    n_tiles = fp // 128
    outs = pl.pallas_call(
        _mmT_kernel,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec((6, 48, _N), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec((48, 128), lambda i: (0, i),
                               memory_space=pltpu.VMEM)] * 6,
        out_specs=[pl.BlockSpec((_N, 128), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((_N, fp), jnp.float32)] * 2,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(planes, *bt)
    return outs


# numeric check vs current r (pre-E, pre-wrap-correction)
t = cached_freq_tables(freqs)
w0 = c[0]
try:
    rre, rim = jax.jit(run_mmT)(w0)
    br_np = np.asarray(t.B).real.astype(np.float32)
    bi_np = np.asarray(t.B).imag.astype(np.float32)

    @jax.jit
    def refs(ww):
        cm, _ = pallas_scan.lag_matrices(ww)
        hi = jax.lax.Precision.HIGHEST
        rr = (jnp.matmul(cm[:, :L], br_np, precision=hi)
              + jnp.matmul(cm[:, L:], bi_np, precision=hi))
        ri = (jnp.matmul(cm[:, :L], bi_np, precision=hi)
              - jnp.matmul(cm[:, L:], br_np, precision=hi))
        return rr, ri

    ref_re, ref_im = refs(w0)
    f_total = np.asarray(t.B).shape[1]
    d_re = np.abs(np.asarray(rre)[:, :f_total] - np.asarray(ref_re))
    scale = np.abs(np.asarray(ref_re)).max()
    print(f"mmT ok: max abs err={d_re.max():.3e} (scale {scale:.1f})",
          flush=True)
except Exception as e:
    print("mmT FAIL:", str(e)[:400], flush=True)
    sys.exit(1)


def loop_time(step, x0, aux=(), n_lo=4, n_hi=16, iters=4):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(x, aux):
            out = jax.lax.fori_loop(0, n, lambda i, s: step(s, *aux), x)
            return jnp.abs(jax.tree_util.tree_leaves(out)[0]
                           .ravel()[0]).astype(jnp.float32)
        float(run(x0, aux))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(x0, aux))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def mmT_step(cc):
    rre, rim = jax.vmap(run_mmT)(cc)
    return cc + (rre[:, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
print(f"mmT+prep       {loop_time(mmT_step, c)/B*1e3:7.3f} ms/win", flush=True)

# prep alone
def prep_step(cc):
    p = jax.vmap(lagT_planes)(cc)
    return cc + (p[:, 0, 0, 0].astype(jnp.float32) % 1.0)[:, None].astype(jnp.complex64) * 1e-20
print(f"lagT_prep      {loop_time(prep_step, c)/B*1e3:7.3f} ms/win", flush=True)
