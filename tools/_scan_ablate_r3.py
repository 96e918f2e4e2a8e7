"""Ablation timing of the real scan kernel on TPU (dev probe).

Copies pallas_scan._scan_kernel with switches that disable pieces
(term rolls -> 864-block adds, select's argmax, select entirely, pad-concat
vs direct slice max) while keeping identical input/output shapes, then times
each variant via the loop method at B=16. Attribution by difference.
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
_SLICES = C.NUM_SCAN_SLICES
_SLICE = C.SCAN_SLICE
_F_TILE = 128

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
freqs = tuple(float(f) for f in cfg.freqs)
P = cfg.scan_depth
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
jax.block_until_ready(c)
print(f"device={jax.devices()[0]} B={B}", flush=True)


def _scan_kernel_abl(scan_depth, num_cand, prec, mode,
                     cmat_ri, bnd_ri,
                     b_re, b_im, e_re, e_im, chi_re, chi_im,
                     pos_out, xb_out):
    ft = b_re.shape[1]

    cr = cmat_ri[:, : C.SYNC_CORR_LEN]
    ci = cmat_ri[:, C.SYNC_CORR_LEN : 2 * C.SYNC_CORR_LEN]
    br, bi = b_re[:], b_im[:]
    r_re, r_im = pallas_scan._cmm(cr, ci, br, bi, "split2")

    bdr = bnd_ri[:, : C.SYNC_CORR_LEN]
    bdi = bnd_ri[:, C.SYNC_CORR_LEN : 2 * C.SYNC_CORR_LEN]
    dr, di = pallas_scan._cmm(bdr, bdi, br, bi, "split2")
    xr, xi = chi_re[:], chi_im[:]
    corr_re = xr * dr - xi * di
    corr_im = xr * di + xi * dr
    tail = _N - (C.SYNC_CORR_LEN - 1)
    r_re = jnp.concatenate([r_re[:tail, :], r_re[tail:, :] + corr_re], axis=0)
    r_im = jnp.concatenate([r_im[:tail, :], r_im[tail:, :] + corr_im], axis=0)

    if mode == "mm_only":
        pos_out[:, :] = jnp.zeros_like(pos_out)
        xb_out[:, :] = jnp.broadcast_to(r_re[0:1, :] + r_im[0:1, :],
                                        xb_out.shape)
        return

    er, ei = e_re[:], e_im[:]
    g_re = er * r_re - ei * r_im
    g_im = er * r_im + ei * r_re

    def rolled(x_re, x_im, a: int):
        s = (-a) % _N
        return pltpu.roll(x_re, s, 0), pltpu.roll(x_im, s, 0)

    q3_re, q3_im = rolled(g_re, g_im, C.SECOND_SYNC_SAMPLE)
    q_re = g_re + q3_re
    q_im = g_im + q3_im

    if mode == "blockadd":
        # term rolls replaced by static 864-block adds (semantics differ,
        # timing-valid: same flops, no data movement)
        def term(m: int):
            sh = (864 * m) % _N
            tre = jnp.concatenate([q_re[sh:, :], q_re[:sh, :]][:1] + [q_re[:sh, :]], axis=0) if False else None
            # static block permutation: 6 blocks of 864 rows
            blocks_re = [q_re[b * 864:(b + 1) * 864, :] for b in range(6)]
            blocks_im = [q_im[b * 864:(b + 1) * 864, :] for b in range(6)]
            ore = jnp.concatenate([blocks_re[(b + m) % 6] for b in range(6)], axis=0)
            oim = jnp.concatenate([blocks_im[(b + m) % 6] for b in range(6)], axis=0)
            return ore, oim
    else:
        def term(m: int):
            return rolled(q_re, q_im, 864 * m)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SLICES, ft), 0)

    def select_full(s_re, s_im, p: int):
        xb = s_re * s_re + s_im * s_im
        pad = xb[: C.SCAN_PAD_LEN - _N, :]
        xbp = jnp.concatenate([xb, pad], axis=0)
        maxs, args = [], []
        for s in range(_SLICES):
            seg = xbp[s * _SLICE : (s + 1) * _SLICE, :]
            maxs.append(jnp.max(seg, axis=0, keepdims=True))
            args.append(jnp.argmax(seg, axis=0).astype(jnp.int32)[None, :])
        smax = jnp.concatenate(maxs, axis=0)
        sarg = jnp.concatenate(args, axis=0)
        cur = smax
        for k in range(num_cand):
            best = jnp.max(cur, axis=0, keepdims=True)
            bslice = jnp.argmax(cur, axis=0).astype(jnp.int32)
            hit = lane_iota == bslice[None, :]
            lag_in_slice = jnp.sum(jnp.where(hit, sarg, 0), axis=0)
            pos = (bslice * _SLICE + lag_in_slice) % _N
            row = p * num_cand + k
            pos_out[row : row + 1, :] = pos[None, :]
            xb_out[row : row + 1, :] = best
            cur = jnp.where(hit, -1.0, cur)

    def select_nopad(s_re, s_im, p: int):
        # fused square+slicemax straight off the planes; wrap slice (20)
        # reads rows [5120:5184] + [0:192]
        maxs, args = [], []
        for s in range(_SLICES):
            lo = s * _SLICE
            hi = min((s + 1) * _SLICE, _N)
            sre = s_re[lo:hi, :]
            sim = s_im[lo:hi, :]
            seg = sre * sre + sim * sim
            if hi - lo < _SLICE:
                sre2 = s_re[: _SLICE - (hi - lo), :]
                sim2 = s_im[: _SLICE - (hi - lo), :]
                seg = jnp.concatenate([seg, sre2 * sre2 + sim2 * sim2], axis=0)
            maxs.append(jnp.max(seg, axis=0, keepdims=True))
            args.append(jnp.argmax(seg, axis=0).astype(jnp.int32)[None, :])
        smax = jnp.concatenate(maxs, axis=0)
        sarg = jnp.concatenate(args, axis=0)
        cur = smax
        for k in range(num_cand):
            best = jnp.max(cur, axis=0, keepdims=True)
            bslice = jnp.argmax(cur, axis=0).astype(jnp.int32)
            hit = lane_iota == bslice[None, :]
            lag_in_slice = jnp.sum(jnp.where(hit, sarg, 0), axis=0)
            pos = (bslice * _SLICE + lag_in_slice) % _N
            row = p * num_cand + k
            pos_out[row : row + 1, :] = pos[None, :]
            xb_out[row : row + 1, :] = best
            cur = jnp.where(hit, -1.0, cur)

    def select_noarg(s_re, s_im, p: int):
        xb = s_re * s_re + s_im * s_im
        pad = xb[: C.SCAN_PAD_LEN - _N, :]
        xbp = jnp.concatenate([xb, pad], axis=0)
        maxs = []
        for s in range(_SLICES):
            seg = xbp[s * _SLICE : (s + 1) * _SLICE, :]
            maxs.append(jnp.max(seg, axis=0, keepdims=True))
        smax = jnp.concatenate(maxs, axis=0)
        cur = smax
        for k in range(num_cand):
            best = jnp.max(cur, axis=0, keepdims=True)
            bslice = jnp.argmax(cur, axis=0).astype(jnp.int32)
            hit = lane_iota == bslice[None, :]
            row = p * num_cand + k
            pos_out[row : row + 1, :] = bslice[None, :]
            xb_out[row : row + 1, :] = best
            cur = jnp.where(hit, -1.0, cur)

    def select_none(s_re, s_im, p: int):
        row = p * num_cand
        xb_out[row : row + 1, :] = (s_re[0:1, :] * s_re[0:1, :]
                                    + jnp.max(s_im, axis=0, keepdims=True))
        pos_out[row : row + 1, :] = jnp.zeros((1, ft), jnp.int32)

    select = {"full": select_full, "blockadd": select_full,
              "nopad": select_nopad,
              "noargmax": select_noarg, "noselect": select_none}[mode]

    acc_re, acc_im = q_re, q_im
    select(acc_re, acc_im, 0)
    for p in range(1, min(scan_depth, 6)):
        tre, tim = term(p)
        acc_re = acc_re + tre
        acc_im = acc_im + tim
        select(acc_re, acc_im, p)
    xb_out[:, :] = jnp.sqrt(jnp.abs(xb_out[:, :]))


def scan_variant(cw, mode):
    t = cached_freq_tables(freqs)
    f_total = t.B.shape[1]
    f_pad = -f_total % _F_TILE
    fp = f_total + f_pad

    def pad_f(a, axis):
        if f_pad == 0:
            return jnp.asarray(a)
        pads = [(0, 0)] * a.ndim
        pads[axis] = (0, f_pad)
        return jnp.pad(jnp.asarray(a), pads)

    Bt = pad_f(t.B, 1); E = pad_f(t.E, 1); chi = pad_f(t.chi, 1)
    cmat_ri, bnd_ri = pallas_scan.lag_matrices(cw)
    n_tiles = fp // _F_TILE

    def tile_spec(rows):
        return pl.BlockSpec((rows, _F_TILE), lambda i: (0, i),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((_N, 2 * C.SYNC_CORR_LEN), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C.SYNC_CORR_LEN - 1, 2 * C.SYNC_CORR_LEN),
                     lambda i: (0, 0), memory_space=pltpu.VMEM),
        tile_spec(C.SYNC_CORR_LEN), tile_spec(C.SYNC_CORR_LEN),
        tile_spec(_N), tile_spec(_N), tile_spec(1), tile_spec(1),
    ]
    rows = P * 8
    out_specs = [
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, fp), jnp.int32),
        jax.ShapeDtypeStruct((rows, fp), jnp.float32),
    ]
    kernel = functools.partial(_scan_kernel_abl, P, 8, None, mode)
    pos, xb = pl.pallas_call(
        kernel, grid=(n_tiles,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(cmat_ri, bnd_ri, Bt.real, Bt.imag, E.real, E.imag, chi.real, chi.imag)
    return pos, xb


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


for mode in ("full", "nopad", "noargmax", "noselect", "blockadd", "mm_only"):
    def step(cc, mode=mode):
        p_, x_ = jax.vmap(lambda w: scan_variant(w, mode))(cc)
        return cc + (x_[:, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
    t = loop_time(step, c)
    print(f"scan[{mode:9s}] {t/B*1e3:7.3f} ms/win", flush=True)

# lag prep alone (for reference)
def lag_step(cc):
    cm, bd = jax.vmap(pallas_scan.lag_matrices)(cc)
    return cc + (cm[:, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
print(f"lag_prep        {loop_time(lag_step, c)/B*1e3:7.3f} ms/win", flush=True)
