"""Fused Pallas TPU kernel for per-candidate softbit demodulation (v2).

The jnp demod (ops/softbits.py) gathers a cyclic 864-sample frame per
candidate with take_along_axis; XLA lowers that to scalar-core gathers
(~900 ms/window deep scan). Round 1's kernel replaced the gathers with
per-candidate (1, 1024) dynamic slices + rotates — correct, but at sublane-1
utilization (7/8 of every vreg idle) it still cost ~2.0 ms/window. This
version restructures extraction around the MXU and full vregs:

  1. tile layout — the doubled mixed signal lives as (88, 128) row tiles per
     frequency (row r, lane l) = z[128 r + l], so a frame chunk is 8
     consecutive *rows* instead of 1024 lanes of one row.
  2. pattern averaging — acc_p = sum_m mask_p[m] * shift(z, 864 m) via
     "shift dances": a 128q+L shift is two sublane rolls + two lane rolls +
     one select, applied to full (88, 128) blocks (every vreg lane busy).
  3. frame extraction = one-hot matmul — the 8 aligned 128-lane segments of
     all 8 candidates of a (freq, pattern) are ONE (64, 48) x (48, 128) MXU
     matmul against the tile (rows = segments, one-hot built in-kernel from
     iota compares). bf16_3x (Precision.HIGH) is bit-exact for one-hot
     operands: f32 = hi+mid+lo is an exact 3x8-bit mantissa split and each
     output sums exactly one input.
  4. residual shift — start % 128 is applied to the stacked (P*64, 1024)
     chunk block with 7 bit-decomposed static lane rolls + per-row selects
     (a dynamic per-row rotate does not exist on TPU; static rolls do, at
     full vreg width). Wrapped garbage lands in lanes >= 897 where the
     matched-filter matrix rows are zero.
  5. demod math — one (P*64, 1024) x (1024, 256) matmul per step at HIGH
     (measured ~190 TFLOP/s effective on v5e vs 34 for HIGHEST): matched
     filter with Q/I columns pre-interleaved (the round-1 P_q/P_i
     interleave matmuls become two lane selects), phase columns riding as
     columns 144/145, then normalization and nbadsync exactly as the
     reference (/root/reference/src/softbits_kernel.cuh:9-248).

Mosaic v5e restrictions honored (see tools/README.md probes): no dynamic
lane slices off 128 alignment, no wide dynamic rotates, no cross-dim
reshapes in-kernel, scalar-prefetch too small for the position table (it
rides VMEM blocks instead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .softbits import _matched_filter_mats, _sync_vec

_N = C.WINDOW_LEN  # 5184
_NC = C.NUM_CANDIDATES_PER_PATTERN  # 8
_FRAME = C.FRAME_LEN  # 864
_FG = 16  # frequencies per grid step (VMEM allows 16 even at
# nc=8: chunks 2x6.3 MB + z planes ~8.6 MB; fewer grid steps =
# less per-step launch overhead)

# tile geometry: doubled window 2N = 10368 = 81 rows of 128 lanes; padded to
# 88 rows (multiple of 8, and room for shift-dance wraparound garbage, which
# after 5 incremental 864-shifts reaches no lower than row 81-7*4 = 53).
_ZROWS = 88
assert 2 * _N == 81 * 128
# extraction reads rows q..q+7 with q = start//128 <= (N-1)//128 = 40, and
# the accumulated signal at rows <= 47 covers start+863+864*5 < 2N.
_AROWS = 48
_CHUNK = 1024
_MFK = 896  # matched-filter K: frame 864 rounded up to a lane-tile multiple

# dev-only stage bisect knob (tools/_demod_r2_bisect.py): names of kernel
# stages to skip when timing — NEVER set in production code
_debug_skip: tuple = ()


@functools.lru_cache(maxsize=None)
def _mf_matrix() -> np.ndarray:
    """(1024, 256) matched filter, Q/I interleaved + phase columns.

    Column 2q = WQ[:, q], 2q+1 = WI[:, q] (so the matmul output is already
    the interleaved 144-softbit order); columns 144/145 = conj sync template
    re/im; rows >= 864 are zero (they absorb residual-shift wrap garbage).
    """
    WQ, WI = _matched_filter_mats()
    sv = _sync_vec()
    M = np.zeros((_MFK, 256), dtype=np.float32)
    M[:_FRAME, 0:144:2] = WQ
    M[:_FRAME, 1:144:2] = WI
    M[:_FRAME, 144] = sv.real
    M[:_FRAME, 145] = sv.imag
    return M


@functools.lru_cache(maxsize=None)
def _lane_masks() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(1, 256) f32 masks: Q (even, <144), data-144 (<144), sync signs."""
    lane = np.arange(256)
    even = ((lane % 2 == 0) & (lane < 144)).astype(np.float32)[None, :]
    in144 = (lane < 144).astype(np.float32)[None, :]
    ssign = np.zeros((1, 256), dtype=np.float32)
    s8 = C.SYNC_WORD_PM.astype(np.float32)
    for base in (C.FIRST_SYNC_BIT, C.SECOND_SYNC_BIT):
        ssign[0, base : base + 8] = s8
    return even, in144, ssign


def _shift_tile(re, im, rows: int, lanes: int):
    """Tile-layout flat shift by S = 128*rows + lanes (lanes in [0,128)):
    out[r, l] = x[r + rows, l + lanes] with row overflow into r+rows+1.
    Cyclic in rows — callers keep >= 7 zero/garbage-tolerant tail rows."""
    n = re.shape[0]

    def one(x):
        a = pltpu.roll(x, n - rows, 0)
        if lanes == 0:
            return a
        b = pltpu.roll(x, n - rows - 1, 0)
        a = pltpu.roll(a, 128 - lanes, 1)
        b = pltpu.roll(b, 128 - lanes, 1)
        lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1) % 128
        return jnp.where(lane < 128 - lanes, a, b)

    return one(re), one(im)


def _split3(x):
    """Exact 3-way bf16 split of f32: x == h + m + l (24 = 3x8 mantissa bits;
    Dekker-style argument, round-to-nearest removes >= 8 bits per step)."""
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _bf16_dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _dot_onehot(oh, x, exact3: bool):
    """oh (0/1 matrix) @ x, bit-exact: each output copies one f32 input, and
    the 3-way split reconstructs it exactly in the f32 accumulator. Mosaic
    in-kernel dots only support DEFAULT (1-pass bf16) and HIGHEST (slow fp32
    contract, measured ~5x slower than 3x bf16 on v5e), hence the manual
    decomposition. exact3=False (interpreter) uses a plain f32 dot."""
    if not exact3:
        return jnp.dot(oh, x, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    oh16 = oh.astype(jnp.bfloat16)
    xh, xm, xl = _split3(x)
    return _bf16_dot(oh16, xh) + _bf16_dot(oh16, xm) + _bf16_dot(oh16, xl)


def _dot_mf(ch, m_f32, m_h, m_l, mode: str):
    """Matched-filter matmul at the requested precision ladder:
    'exact3' = 3-pass bf16 (~f32 quality, ~190 TFLOP/s effective on v5e),
    'fast' = 1-pass bf16 (the fast_math option), 'f32' = plain HIGHEST
    (interpreter / reference path)."""
    if mode == "fast":
        return jnp.dot(ch, m_f32, preferred_element_type=jnp.float32)
    if mode == "f32":
        return jnp.dot(ch, m_f32, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    chh, chm, _ = _split3(ch)
    return (_bf16_dot(chh, m_h[:, :]) + _bf16_dot(chh, m_l[:, :])
            + _bf16_dot(chm, m_h[:, :]))


def _demod_kernel(n_pat: int, nc: int, mf_mode: str, exact3: bool,
                  skip: frozenset,
                  c_re, c_im, w_re, w_im, pos_ref, m_ref, m_h, m_l, masks_ref,
                  sb_out, nbad_out,
                  z_re, z_im, zs_re, zs_im, acc_ri, ch_re, ch_im, col_s):
    # ---- mix: z = c * W for the step's frequencies, in tile layout ----
    cr, ci = c_re[:, :], c_im[:, :]
    wr, wi = w_re[:, :], w_im[:, :]
    z_re[:, :] = cr * wr - ci * wi
    z_im[:, :] = cr * wi + ci * wr
    has_gap = n_pat >= 7  # gap patterns re-start the dance from pristine z;
    # without them the shift dance can run on z in place (no zs copies)
    d_re, d_im = (zs_re, zs_im) if has_gap else (z_re, z_im)

    iota48 = jax.lax.broadcasted_iota(jnp.int32, (nc * 8, _AROWS), 1)
    icol = jax.lax.broadcasted_iota(jnp.int32, (nc * 8, 1), 0) // nc

    def extract(p: int):
        """One-hot matmul extraction of pattern p's candidate chunks into
        ch rows f*(P*nc) + p*nc + k (frequency-major, so the kernel output
        reshapes to (F, P, nc) with no transpose), lanes i*128+l. The acc
        tiles carry re|im packed on lanes 0:128|128:256, so one matmul per
        (pattern, freq) extracts both planes. Also drops each candidate's
        raw position into col_s (the residual stage reads it back as one
        (P*64, 1) column — Mosaic cannot concat sublane slices taken at
        different offsets, but a memory roundtrip normalizes the layout)."""
        if "extract" in skip:
            return
        for f in range(_FG):
            pos8 = pos_ref[p * nc : (p + 1) * nc, f : f + 1]  # (nc, 1)
            base = f * n_pat * nc + p * nc
            col_s[base : base + nc, 0:1] = pos8
            q8 = pos8 // 128
            qcol = pltpu.repeat(q8, 8, 0)  # (8nc, 1): row i*nc+k -> q_k
            oh = jnp.where((qcol + icol) == iota48, 1.0, 0.0)  # (8nc, 48)
            a = acc_ri[f * _AROWS : (f + 1) * _AROWS, :]  # (48, 256) re|im
            pri = _dot_onehot(oh, a, exact3)  # (8nc, 256)
            for i in range(8):
                ch_re[base : base + nc, i * 128 : (i + 1) * 128] = \
                    pri[i * nc : (i + 1) * nc, 0:128]
                ch_im[base : base + nc, i * 128 : (i + 1) * 128] = \
                    pri[i * nc : (i + 1) * nc, 128:256]

    def add_rows(first: bool, src_re, src_im):
        """acc (+)= src, taking the first 48 rows of each 88-row freq block
        into the packed re|im halves."""
        for f in range(_FG):
            a, b = f * _AROWS, (f + 1) * _AROWS
            s = f * _ZROWS
            if first:
                acc_ri[a:b, 0:128] = src_re[s : s + _AROWS, :]
                acc_ri[a:b, 128:256] = src_im[s : s + _AROWS, :]
            else:
                acc_ri[a:b, 0:128] = acc_ri[a:b, 0:128] + src_re[s : s + _AROWS, :]
                acc_ri[a:b, 128:256] = acc_ri[a:b, 128:256] + src_im[s : s + _AROWS, :]

    def shift_zs(rows: int, lanes: int):
        for f in range(_FG):
            o = f * _ZROWS
            r2, i2 = _shift_tile(d_re[o : o + _ZROWS, :],
                                 d_im[o : o + _ZROWS, :], rows, lanes)
            d_re[o : o + _ZROWS, :] = r2
            d_im[o : o + _ZROWS, :] = i2

    # ---- prefix patterns 0..min(n_pat,6)-1 -----------------------------
    if has_gap:
        d_re[:, :] = z_re[:, :]
        d_im[:, :] = z_im[:, :]
    add_rows(True, z_re, z_im)  # acc = z
    extract(0)
    for p in range(1, min(n_pat, 6)):
        if "dance" not in skip:
            shift_zs(6, 96)  # incremental +864
            add_rows(False, d_re, d_im)
        extract(p)
    if n_pat >= 7:  # gap pattern 6: frames {0, 3}
        d_re[:, :] = z_re[:, :]
        d_im[:, :] = z_im[:, :]
        shift_zs(20, 32)  # +2592
        add_rows(True, z_re, z_im)
        add_rows(False, d_re, d_im)
        extract(6)
        if n_pat >= 8:  # gap pattern 7: frames {0, 3, 4}
            shift_zs(6, 96)  # +3456 total
            add_rows(False, d_re, d_im)
            extract(7)

    # ---- residual shift: start % 128, bit-decomposed static rolls on the
    # whole (P*64, 1024) chunk block at once; per-row residuals come back
    # from the col_s scratch as one column ------------------------------
    chr_ = ch_re[:, :]
    chi_ = ch_im[:, :]
    if "residual" not in skip:
        rcol = col_s[:, 0:1] % 128  # (P*64, 1)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            take = (rcol & bit) != 0
            chr_ = jnp.where(take, pltpu.roll(chr_, _CHUNK - bit, 1), chr_)
            chi_ = jnp.where(take, pltpu.roll(chi_, _CHUNK - bit, 1), chi_)

    # ---- matched filter + phase, one fat matmul pair per step ----------
    # (K trimmed to 896: the shifted frame occupies lanes [0, 864); lanes
    # beyond carry wrap garbage and the matrix rows there are zero anyway)
    if "mf" in skip:
        A = chr_[:, :256]
        Bm = chi_[:, :256]
    else:
        A = _dot_mf(chr_[:, :_MFK], m_ref[:, :], m_h, m_l, mf_mode)
        Bm = _dot_mf(chi_[:, :_MFK], m_ref[:, :], m_h, m_l, mf_mode)

    sb_scaled, nbad = mf_tail(A, Bm, masks_ref)
    sb_out[:, :] = sb_scaled
    # only lane 0 is consumed host-side; skip the 128-lane broadcast store
    nbad_out[:, 0:1] = nbad.astype(jnp.int32)


def mf_tail(A, Bm, masks_ref):
    """Shared post-matched-filter math (rows = candidates): carrier-phase
    derotation, softbit normalization, nbadsync. A/Bm are the (R, 256)
    matched-filter outputs of the chunk re/im planes; masks_ref rows are the
    _lane_masks() tuple. Returns (scaled 128 data softbits (R, 128),
    nbadsync column (R, 1) f32). Mirrors softbits_kernel.cuh:129-248."""
    s_re = A[:, 144:145] - Bm[:, 145:146]  # (R, 1); sv holds conj template
    s_im = Bm[:, 144:145] + A[:, 145:146]
    mag = jnp.sqrt(s_re * s_re + s_im * s_im)
    inv = 1.0 / jnp.maximum(mag, 1e-30)
    cre = s_re * inv  # cfac = conj(s)/|s|
    cim = -s_im * inv

    even = masks_ref[0:1, :]
    in144 = masks_ref[1:2, :]
    ssign = masks_ref[2:3, :]
    # derotation with the interleave folded into column order:
    # even (Q) lanes: c_re*Bm + c_im*A ; odd (I) lanes: c_re*A - c_im*Bm
    sb144 = (cre * jnp.where(even != 0.0, Bm, A)
             + cim * jnp.where(even != 0.0, A, -Bm)) * in144  # (R, 256)

    # normalization over the 144 real softbits (softbits_kernel.cuh:186-201)
    sav = jnp.sum(sb144, axis=-1, keepdims=True) * (1.0 / 144.0)
    s2av = jnp.sum(sb144 * sb144, axis=-1, keepdims=True) * (1.0 / 144.0)
    # E[(x-m)^2] over the masked 144 lanes == E[x^2] - m^2 (mask holds zeros)
    ssig = jnp.sqrt(jnp.maximum(s2av - sav * sav, 1e-30))
    scale = 2.0 / (ssig * (C.SOFTBIT_SIGMA ** 2))

    hard = jnp.where(sb144 < 0.0, -1.0, 1.0)
    agree = jnp.sum(jnp.where(ssign != 0.0, hard * ssign, 0.0), axis=-1,
                    keepdims=True)
    nbad = (16.0 - agree) * 0.5

    # the 128 data softbits: interleaved lanes [8:56) + [64:144)
    sb128 = jnp.concatenate([sb144[:, 8:56], sb144[:, 64:144]], axis=-1)
    return scale * sb128, nbad


def _tile_window(c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(N,) complex window -> (704, 128) re/im tiles of the doubled signal,
    replicated per step frequency (8 blocks of 88 rows)."""
    ext = jnp.concatenate([c, c, jnp.zeros(((_ZROWS * 128) - 2 * _N,), c.dtype)])
    tile = ext.reshape(_ZROWS, 128)
    rep = jnp.tile(tile, (_FG, 1))
    return rep.real.astype(jnp.float32), rep.imag.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _w_tiles(freqs_key: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Mix-carrier tables in tile layout: (NSTEP*704, 128) re/im with
    W[f, t] = exp(-2j pi f t / fs), doubled along t, zero-padded."""
    freqs = np.asarray(freqs_key, dtype=np.float64)
    F = len(freqs)
    Fp = F + (-F % _FG)
    t = np.arange(_N)
    phase = np.mod(np.outer(freqs, t) / C.SAMPLE_RATE, 1.0)
    W = np.exp(-2j * np.pi * phase).astype(np.complex64)
    ext = np.zeros((Fp, _ZROWS * 128), dtype=np.complex64)
    ext[:F, :_N] = W
    ext[:F, _N : 2 * _N] = W
    tiles = ext.reshape(Fp * _ZROWS, 128)
    return (np.ascontiguousarray(tiles.real),
            np.ascontiguousarray(tiles.imag))


def demod_pallas(c: jnp.ndarray, freqs, pos: jnp.ndarray,
                 interpret: bool | None = None,
                 fast_math: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-window demod of all candidates (vmap-batchable).

    c: (N,) complex64 analytic window. freqs: static tuple of search
    frequencies or tables.FreqTables (sharded path: W arrives traced).
    pos: (F, P, k) int32 candidate positions in [0, N); k <= 8 is the
    cfg.candidates_per_pattern knob (scan emits lags in descending xb order,
    so k < 8 keeps the best-sync k lags per slot).
    Returns (softbits (F, P, k, 128) f32, nbadsync (F, P, k) i32).
    interpret=None: auto (interpreter off TPU, compiled on TPU).
    """
    from .tables import FreqTables

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F, Pn, nc = pos.shape
    f_pad = -F % _FG
    Fp = F + f_pad
    nstep = Fp // _FG

    if isinstance(freqs, FreqTables):
        W = freqs.W  # (F, N) traced
        ext = jnp.concatenate(
            [W, W, jnp.zeros((F, _ZROWS * 128 - 2 * _N), W.dtype)], axis=1)
        if f_pad:
            ext = jnp.concatenate(
                [ext, jnp.zeros((f_pad, _ZROWS * 128), W.dtype)], axis=0)
        tiles = ext.reshape(Fp * _ZROWS, 128)
        w_re, w_im = tiles.real.astype(jnp.float32), tiles.imag.astype(jnp.float32)
    else:
        w_re, w_im = (jnp.asarray(a) for a in
                      _w_tiles(tuple(float(f) for f in freqs)))

    c_re, c_im = _tile_window(c)

    # positions in kernel-friendly transposed layout: (nstep*48, 128) with
    # row s*48 + p*8 + k, lane f = pos[s*8+f, p, k]
    pos_p = jnp.concatenate(
        [pos, jnp.zeros((f_pad, Pn, nc), pos.dtype)], axis=0) if f_pad else pos
    pos_t = pos_p.reshape(nstep, _FG, Pn * nc).transpose(0, 2, 1)
    pos_t = jnp.concatenate(
        [pos_t, jnp.zeros((nstep, Pn * nc, 128 - _FG), pos_t.dtype)], axis=2)
    pos_rows = pos_t.reshape(nstep * Pn * nc, 128)
    pad_rows = -(Pn * nc) % 8  # sublane-8 alignment of the block
    if pad_rows:
        pos_rows = pos_rows.reshape(nstep, Pn * nc, 128)
        pos_rows = jnp.concatenate(
            [pos_rows, jnp.zeros((nstep, pad_rows, 128), pos_rows.dtype)],
            axis=1).reshape(nstep * (Pn * nc + pad_rows), 128)
    prow_blk = Pn * nc + pad_rows

    M = _mf_matrix()
    mh = M.astype(np.float32).astype(jnp.bfloat16)
    ml = (M - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
    even, in144, ssign = _lane_masks()
    masks = np.concatenate([even, in144, ssign], axis=0)
    masks = np.concatenate(
        [masks, np.zeros((5, 256), np.float32)], axis=0)  # (8, 256)

    # precision ladder (Mosaic in-kernel dots only do DEFAULT/HIGHEST; the
    # 3-pass bf16 splits are manual): interpreter -> plain f32 everywhere.
    mf_mode = "f32" if interpret else ("fast" if fast_math else "exact3")
    exact3 = not interpret
    R = Pn * nc * _FG  # output rows per step

    kernel = functools.partial(_demod_kernel, Pn, nc, mf_mode, exact3,
                               frozenset(_debug_skip))
    const = lambda r, cc: pl.BlockSpec((r, cc), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM)
    sb, nbad128 = pl.pallas_call(
        kernel,
        grid=(nstep,),
        in_specs=[
            const(_FG * _ZROWS, 128),  # c re (replicated per freq block)
            const(_FG * _ZROWS, 128),  # c im
            pl.BlockSpec((_FG * _ZROWS, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # W re
            pl.BlockSpec((_FG * _ZROWS, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # W im
            pl.BlockSpec((prow_blk, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # pos_t
            const(_MFK, 256),  # matched filter f32
            const(_MFK, 256),  # matched filter bf16 high part
            const(_MFK, 256),  # matched filter bf16 low part
            const(8, 256),       # lane masks
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda s: (s, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nstep * R, 128), jnp.float32),
            jax.ShapeDtypeStruct((nstep * R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_FG * _ZROWS, 128), jnp.float32),  # z re
            pltpu.VMEM((_FG * _ZROWS, 128), jnp.float32),  # z im
            pltpu.VMEM((_FG * _ZROWS if Pn >= 7 else 8, 128), jnp.float32),  # zs re
            pltpu.VMEM((_FG * _ZROWS if Pn >= 7 else 8, 128), jnp.float32),  # zs im
            pltpu.VMEM((_FG * _AROWS, 256), jnp.float32),  # acc re|im packed
            pltpu.VMEM((Pn * nc * _FG, _CHUNK), jnp.float32),  # chunks re
            pltpu.VMEM((Pn * nc * _FG, _CHUNK), jnp.float32),  # chunks im
            pltpu.VMEM((Pn * nc * _FG, 128), jnp.int32),  # candidate pos col
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c_re, c_im, w_re, w_im, pos_rows, M, np.asarray(mh), np.asarray(ml),
      masks)

    # rows are frequency-major (step, f_in_group, pattern, k): plain reshape
    sb = sb.reshape(Fp, Pn, nc, 128)[:F]
    nbad = nbad128[:, 0].reshape(Fp, Pn, nc)[:F]
    return sb, nbad
