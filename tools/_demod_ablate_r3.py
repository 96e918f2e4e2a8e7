"""Ablation timing of the (round-3 offset-class) survivor-demod kernel on
TPU (dev probe). Variants disable pieces with shapes unchanged: the one-hot
chunk extraction, the per-term gamma mix, the post-sum residual roll, the
carrier, the matched filter. Attribution by difference against full."""
import functools
import sys, time
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan, pallas_survivor as PS
from msk144cudecoder_tpu.ops.pallas_demod import (_dot_mf, _dot_onehot,
                                                  _lane_masks, _mf_matrix,
                                                  mf_tail)
from msk144cudecoder_tpu.ops.tables import cached_freq_tables

_N = C.WINDOW_LEN
_CHUNK = 1024
_MFK = 896
_CROWS = 96

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
freqs = tuple(float(f) for f in cfg.freqs)
PRE = 2 * cfg.max_survivors
P = cfg.scan_depth
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
pos, xb = jax.jit(lambda cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
    w, freqs, P))(cc))(c)
xb_f, pos_f, f_idx, p_idx, flat_idx = jax.jit(
    lambda p_, x_: jax.vmap(lambda pw, xw: pipeline.prefilter_select(
        xw, pw, PRE, 2, None))(p_, x_))(pos, xb)
jax.block_until_ready(pos_f)
print(f"device={jax.devices()[0]} B={B} PRE={PRE}", flush=True)

seg_sizes = pipeline.split_quota(PRE, P)
offs = np.cumsum([0] + seg_sizes)


def _kernel_abl(sb_blk, m_list, mode,
                c_ri, car_ref, ints_ref, gam_ref,
                m_ref, m_h, m_l, masks_ref,
                sb_out, nbad_out):
    n_terms = len(m_list)
    lane96 = jax.lax.broadcasted_iota(jnp.int32, (sb_blk, _CROWS), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (sb_blk, _CHUNK), 1)
    ar = ai = None
    for j, m in enumerate(m_list):
        rs = slice(j * sb_blk, (j + 1) * sb_blk)
        cls = PS._term_geometry(m)[1]
        qcol = ints_ref[rs, 0:1]
        if mode == "noextract":
            ch = jnp.broadcast_to(c_ri[0:1, :], (sb_blk, 2048)) * (
                qcol.astype(jnp.float32) * 1e-20 + 1.0)
        else:
            oh = jnp.where(qcol == lane96, 1.0, 0.0)
            ch = _dot_onehot(oh, c_ri[cls * _CROWS:(cls + 1) * _CROWS, :],
                             True)
        chr_ = ch[:, :_CHUNK]
        chi_ = ch[:, _CHUNK:]
        if mode == "nomix":
            zr = chr_ * gam_ref[rs, 0:1]
            zi = chi_ * gam_ref[rs, 3:4]
        else:
            t1 = ints_ref[rs, 2:3]
            t2 = ints_ref[rs, 3:4]
            g = gam_ref[rs, :]

            def pick(k0, k1, k2):
                a = jnp.where(lane < t1, g[:, k0:k0 + 1], g[:, k1:k1 + 1])
                return jnp.where(lane < t2, a, g[:, k2:k2 + 1])

            gre = pick(0, 1, 2)
            gim = pick(3, 4, 5)
            zr = chr_ * gre - chi_ * gim
            zi = chr_ * gim + chi_ * gre
        if ar is None:
            ar, ai = zr, zi
        else:
            ar = ar + zr
            ai = ai + zi

    if mode != "noroll":
        rcol = ints_ref[0:sb_blk, 1:2]
        for bit in (64, 32, 16, 8, 4, 2, 1):
            take = (rcol & bit) != 0
            ar = jnp.where(take, pltpu.roll(ar, _CHUNK - bit, 1), ar)
            ai = jnp.where(take, pltpu.roll(ai, _CHUNK - bit, 1), ai)
    ar = ar[:, :_MFK]
    ai = ai[:, :_MFK]

    if mode == "nocarrier":
        fr, fi = ar, ai
    else:
        car = car_ref[:, :]
        wrre = car[:, 14:142]
        wrim = car[:, 142:270]
        wbr, wbi = [], []
        for j in range(_MFK // 128):
            qr = car[:, j:j + 1]
            qi = car[:, 7 + j:8 + j]
            wbr.append(qr * wrre - qi * wrim)
            wbi.append(qr * wrim + qi * wrre)
        w_re = jnp.concatenate(wbr, axis=1)
        w_im = jnp.concatenate(wbi, axis=1)
        fr = ar * w_re - ai * w_im
        fi = ar * w_im + ai * w_re

    if mode == "nomf":
        sb_out[:, :] = fr[:, :128] + fi[:, :128]
        nbad_out[:, 0:1] = jnp.zeros((sb_blk, 1), jnp.int32)
        return
    AB = _dot_mf(jnp.concatenate([fr, fi], axis=0), m_ref[:, :], m_h, m_l,
                 "exact3")
    A = AB[:sb_blk, :]
    Bm = AB[sb_blk:, :]
    sb_scaled, nbad = mf_tail(A, Bm, masks_ref)
    sb_out[:, :] = sb_scaled
    nbad_out[:, 0:1] = nbad.astype(jnp.int32)


def demod_variant(cw, pos_s, fi_, pi_, sb_blk, terms, mode):
    t = cached_freq_tables(freqs)
    W = jnp.asarray(t.W)
    chi = jnp.asarray(t.chi[0])
    S = pos_s.shape[0]
    nstep = S // sb_blk
    m_list = terms
    n_terms = len(m_list)
    ints, gam, car = PS.survivor_params(pos_s, fi_, pi_, W, chi, terms)

    def rows_mmajor(a):
        cols = a.shape[-1]
        r = a.reshape(nstep, sb_blk, n_terms, cols).transpose(0, 2, 1, 3)
        return r.reshape(nstep * n_terms * sb_blk, cols)

    def pad128(a, to=128):
        w = -a.shape[-1] % to
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (w,), a.dtype)], axis=-1)

    ints_rows = pad128(rows_mmajor(ints))
    gam_rows = pad128(rows_mmajor(gam))
    car_rows = pad128(car)
    c_ri = PS._ext_window(cw)
    M = _mf_matrix()
    mh = M.astype(np.float32).astype(jnp.bfloat16)
    ml = (M - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
    even, in144, ssign = _lane_masks()
    masks = np.concatenate([even, in144, ssign], axis=0)
    masks = np.concatenate([masks, np.zeros((5, 256), np.float32)], axis=0)
    kernel = functools.partial(_kernel_abl, sb_blk, m_list, mode)
    const = lambda r, cc: pl.BlockSpec((r, cc), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM)
    rows = n_terms * sb_blk
    sb, nbad128 = pl.pallas_call(
        kernel,
        grid=(nstep,),
        in_specs=[
            const(4 * _CROWS, 2048),
            pl.BlockSpec((sb_blk, 384), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            const(_MFK, 256), const(_MFK, 256), const(_MFK, 256),
            const(8, 256),
        ],
        out_specs=[
            pl.BlockSpec((sb_blk, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sb_blk, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((S, 128), jnp.float32),
            jax.ShapeDtypeStruct((S, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(c_ri, car_rows, ints_rows, gam_rows,
      M, np.asarray(mh), np.asarray(ml), masks)
    return sb, nbad128[:, 0]


def tiered(cw, pp, ff, qq, mode):
    sb_parts, nbad_parts = [], []
    for p in range(P):
        tl = tuple(int(x) for x in np.nonzero(C.PATTERN_MASKS[p])[0])
        sl = slice(int(offs[p]), int(offs[p + 1]))
        n = seg_sizes[p]
        npad = -n % 8
        padz = lambda a: jnp.pad(a[sl], (0, npad))
        sbp, nbp = demod_variant(cw, padz(pp), padz(ff), padz(qq),
                                 n + npad, tl, mode)
        sb_parts.append(sbp[:n])
        nbad_parts.append(nbp[:n])
    return jnp.concatenate(sb_parts), jnp.concatenate(nbad_parts)


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


for mode in ("full", "noroll", "noextract", "nomix", "nocarrier", "nomf"):
    def step(p_, cc, f_, q_, mode=mode):
        sb, nb = jax.vmap(lambda w, pp, ff, qq: tiered(w, pp, ff, qq, mode))(
            cc, p_, f_, q_)
        return p_ + nb % 2
    t = loop_time(step, pos_f, (c, f_idx, p_idx))
    print(f"demod[{mode:10s}] {t/B*1e3:7.3f} ms/win", flush=True)

# params-prep + ext-window alone
def params_step(p_, f_, q_):
    t = cached_freq_tables(freqs)
    W = jnp.asarray(t.W)
    chi = jnp.asarray(t.chi[0])
    out = jax.vmap(lambda pp, ff, qq: PS.survivor_params(
        pp, ff, qq, W, chi, None)[1])(p_, f_, q_)
    return p_ + (out[:, 0, 0, 0] % 2.0).astype(jnp.int32)[:, None]
print(f"params_prep      {loop_time(params_step, pos_f, (f_idx, p_idx))/B*1e3:7.3f} ms/win",
      flush=True)
def ext_step(cc):
    r = jax.vmap(PS._ext_window)(cc)
    return cc + (r[:, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
print(f"ext_window       {loop_time(ext_step, c)/B*1e3:7.3f} ms/win", flush=True)
