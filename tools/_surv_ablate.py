"""Stage ablation of the survivor-demod kernel (dev probe).

Times demod_survivors with individual stages stubbed out (wrong results,
right shapes) via the loop method; differences to the full kernel give
per-stage device cost. Flat path (terms=None, T=6), S=1024, B=16.
"""
import sys, time, functools
sys.path.insert(0, ".")
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan
from msk144cudecoder_tpu.ops import pallas_survivor as PS
from msk144cudecoder_tpu.ops.pallas_demod import _dot_mf, _dot_onehot, _lane_masks, _mf_matrix, mf_tail

_N = C.WINDOW_LEN
_M = C.PATTERN_LEN
_CHUNK = PS._CHUNK
_MFK = PS._MFK
_CROWS = PS._CROWS


def kernel(sb_blk, n_terms, mf_mode, exact3, skip,
           c_ri, wf_re, wf_im, ints_ref, fidx_ref, gam_ref,
           m_ref, m_h, m_l, masks_ref, sb_out, nbad_out, ch_re, ch_im):
    rows = n_terms * sb_blk
    if "extract" not in skip:
        qcol = ints_ref[:, 0:1]
        qrep = pltpu.repeat(qcol, 8, 0)
        icol = jax.lax.broadcasted_iota(jnp.int32, (8 * rows, 1), 0) // rows
        lane96 = jax.lax.broadcasted_iota(jnp.int32, (8 * rows, _CROWS), 1)
        oh = jnp.where((qrep + icol) == lane96, 1.0, 0.0)
        pri = _dot_onehot(oh, c_ri[:, :], exact3)
        for i in range(8):
            seg = pri[i * rows : (i + 1) * rows, :]
            ch_re[:, i * 128 : (i + 1) * 128] = seg[:, 0:128]
            ch_im[:, i * 128 : (i + 1) * 128] = seg[:, 128:256]
    else:
        ch_re[:, :] = jnp.zeros((rows, _CHUNK), jnp.float32) + ints_ref[:, 0:1]
        ch_im[:, :] = jnp.zeros((rows, _CHUNK), jnp.float32)
    chr_ = ch_re[:, :]
    chi_ = ch_im[:, :]
    if "roll" not in skip:
        rcol = ints_ref[:, 1:2]
        for bit in (64, 32, 16, 8, 4, 2, 1):
            take = (rcol & bit) != 0
            chr_ = jnp.where(take, pltpu.roll(chr_, _CHUNK - bit, 1), chr_)
            chi_ = jnp.where(take, pltpu.roll(chi_, _CHUNK - bit, 1), chi_)
    chr_ = chr_[:, :_MFK]
    chi_ = chi_[:, :_MFK]
    if "mix" not in skip:
        lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _MFK), 1)
        t1 = ints_ref[:, 2:3]
        t2 = ints_ref[:, 3:4]
        def pick(k0, k1, k2):
            a = jnp.where(lane < t1, gam_ref[:, k0:k0+1], gam_ref[:, k1:k1+1])
            return jnp.where(lane < t2, a, gam_ref[:, k2:k2+1])
        gre = pick(0, 1, 2)
        gim = pick(3, 4, 5)
        zr = chr_ * gre - chi_ * gim
        zi = chr_ * gim + chi_ * gre
    else:
        zr, zi = chr_, chi_
    ar = zr[0:sb_blk, :]
    ai = zi[0:sb_blk, :]
    for m in range(1, n_terms):
        ar = ar + zr[m * sb_blk:(m + 1) * sb_blk, :]
        ai = ai + zi[m * sb_blk:(m + 1) * sb_blk, :]
    if "carrier" not in skip:
        fcol = fidx_ref[:, 0:1]
        fpad = wf_re.shape[0]
        lanef = jax.lax.broadcasted_iota(jnp.int32, (sb_blk, fpad), 1)
        ohf = jnp.where(fcol == lanef, 1.0, 0.0)
        w_re = _dot_onehot(ohf, wf_re[:, :], exact3)
        w_im = _dot_onehot(ohf, wf_im[:, :], exact3)
        fr = ar * w_re - ai * w_im
        fi = ar * w_im + ai * w_re
    else:
        fr, fi = ar, ai
    if "mf" not in skip:
        A = _dot_mf(fr, m_ref[:, :], m_h, m_l, mf_mode)
        Bm = _dot_mf(fi, m_ref[:, :], m_h, m_l, mf_mode)
        sb_scaled, nbad = mf_tail(A, Bm, masks_ref)
        sb_out[:, :] = sb_scaled
        nbad_out[:, 0:1] = nbad.astype(jnp.int32)
    else:
        sb_out[:, :] = fr[:, :128] + fi[:, :128]
        nbad_out[:, :] = jnp.zeros((sb_blk, 128), jnp.int32)


def demod(c, freqs, pos_s, f_idx, p_idx, skip=(), sb_blk=128):
    t = PS.cached_freq_tables(tuple(float(f) for f in freqs))
    W = jnp.asarray(t.W); chi = jnp.asarray(t.chi[0])
    F = W.shape[0]
    S = pos_s.shape[0]
    nstep = S // sb_blk
    n_terms = _M
    ints, gam = PS.survivor_params(pos_s, f_idx, p_idx, W, chi, None)
    def rows_mmajor(a):
        cols = a.shape[-1]
        r = a.reshape(nstep, sb_blk, n_terms, cols).transpose(0, 2, 1, 3)
        return r.reshape(nstep * n_terms * sb_blk, cols)
    def pad128(a):
        return jnp.concatenate([a, jnp.zeros(a.shape[:-1] + (128 - a.shape[-1],), a.dtype)], axis=-1)
    ints_rows = pad128(rows_mmajor(ints))
    gam_rows = pad128(rows_mmajor(gam))
    fidx_rows = pad128(f_idx.astype(jnp.int32)[:, None])
    fpad = -F % 128
    wf = W[:, :_MFK]
    if fpad:
        wf = jnp.concatenate([wf, jnp.zeros((fpad, _MFK), wf.dtype)], axis=0)
    c_ri = PS._ext_window(c)
    M = _mf_matrix()
    mh = M.astype(np.float32).astype(jnp.bfloat16)
    ml = (M - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
    even, in144, ssign = _lane_masks()
    masks = np.concatenate([even, in144, ssign], axis=0)
    masks = np.concatenate([masks, np.zeros((5, 256), np.float32)], axis=0)
    k = functools.partial(kernel, sb_blk, n_terms, "exact3", True, skip)
    const = lambda r, cc: pl.BlockSpec((r, cc), lambda s: (0, 0), memory_space=pltpu.VMEM)
    rows = n_terms * sb_blk
    sb, nbad128 = pl.pallas_call(
        k, grid=(nstep,),
        in_specs=[const(_CROWS, 256), const(F + fpad, _MFK), const(F + fpad, _MFK),
                  pl.BlockSpec((rows, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((sb_blk, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((rows, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
                  const(_MFK, 256), const(_MFK, 256), const(_MFK, 256), const(8, 256)],
        out_specs=[pl.BlockSpec((sb_blk, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((sb_blk, 128), lambda s: (s, 0), memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((S, 128), jnp.float32),
                   jax.ShapeDtypeStruct((S, 128), jnp.int32)],
        scratch_shapes=[pltpu.VMEM((rows, _CHUNK), jnp.float32),
                        pltpu.VMEM((rows, _CHUNK), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(c_ri, wf.real.astype(jnp.float32), wf.imag.astype(jnp.float32),
      ints_rows, fidx_rows, gam_rows, M, np.asarray(mh), np.asarray(ml), masks)
    return sb, nbad128[:, 0]


def main():
    cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                        nbadsync_threshold=3, max_survivors=512)
    freqs = tuple(float(f) for f in cfg.freqs)
    B = 16
    S = 1024
    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
    c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
    pos_s = jax.device_put(rng.integers(0, _N, (B, S)).astype(np.int32))
    f_idx = jax.device_put(rng.integers(0, cfg.num_freqs, (B, S)).astype(np.int32))
    p_idx = jax.device_put(rng.integers(0, 6, (B, S)).astype(np.int32))

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

    def loop_time(skip, n_lo=2, n_hi=6, iters=3):
        dm = lambda cc: jax.vmap(lambda w, pp, ff, qq: demod(
            w, freqs, pp, ff, qq, skip))(cc, pos_s, f_idx, p_idx)
        times = {}
        for n in (n_lo, n_hi):
            @jax.jit
            def run(s0, cc):
                def body(i, s):
                    sb = dm(cc + s.astype(jnp.complex64))[0]
                    return jnp.sum(sb[0, 0, :8]) * 1e-30
                return jax.lax.fori_loop(0, n, body, s0)
            ts = []
            fetch(run(0.0, c))
            for _ in range(iters):
                t0 = time.perf_counter(); fetch(run(0.0, c)); ts.append(time.perf_counter() - t0)
            times[n] = min(ts)
        return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

    full = loop_time(())
    print(f"full           {full/B*1e3:7.3f} ms/win", flush=True)
    for sk in (("roll",), ("extract",), ("mix",), ("carrier",), ("mf",)):
        t = loop_time(sk)
        print(f"skip {sk[0]:<9} {t/B*1e3:7.3f} ms/win  (stage ~{(full-t)/B*1e3:6.3f})",
              flush=True)


if __name__ == "__main__":
    main()
