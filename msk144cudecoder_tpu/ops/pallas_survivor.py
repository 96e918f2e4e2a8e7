"""Survivor-only softbit demodulation: full demod for a prefiltered
candidate subset, with mixing and pattern averaging folded into per-survivor
scalars.

The full demod kernel (ops/pallas_demod.py) demodulates every scan candidate
(deep scan: 24,048) because the reference does
(/root/reference/src/softbits_kernel.cuh:9-248 runs one block per candidate).
But only ~max_survivors of them ever reach the LDPC stage, and the scan's xb
metric (|sync correlation|, the exact statistic the demod re-derives as its
carrier-phase magnitude) already orders candidates: a prefilter keeping the
top P candidates by xb preserves every realistically decodable candidate
while cutting demod work by >10x (see ops/pipeline.py:select wiring and the
sensitivity results in ARCHITECTURE.md).

Per survivor s with position pos, frequency f and averaging pattern p, the
averaged frame the reference demodulates is

  frame[l] = sum_m mask_p[m] * c[(pos + 864 m + l) mod N] * W_f[(pos + 864 m + l) mod N]

Using W_f[t] = exp(-2j pi f t / fs) and splitting (pos + 864m + l) mod N =
pos + 864m + l - k N  (k in {0,1,2}), the W factor separates exactly:

  W_f[(pos+864m+l) mod N] = W_f[pos] * W_f[864m] * W_f[l] * phi_f^k,
  phi_f = exp(+2j pi f N / fs) = conj(1 + chi_f)    (chi from ops/tables.py)

so   frame[l] = W_f[l] * sum_m gamma[s,m,k] * c_ext[pos + 864m + l],
     gamma[s,m,k] = mask_p[m] * W[f, pos] * W[f, 864m] * phi_f^k

with c_ext the analytic window cyclically extended (no mod in the kernel)
and k a per-(s,m) pair of lane thresholds. Every gamma factor is an exact
host-table value (W is mod-reduced in float64, tables.py:44-46); the only
deviation from table-mixing is the float32 product itself (~1e-7 relative).

Kernel shape per grid step (SB survivors), round-3 "offset-class" layout:
  1. chunk extraction — term m's chunk starts at start_m = pos + 864m.
     Since 864 = 6*128 + 96, the residue start_m % 128 = (pos + 96 m) % 128
     differs per term — but only through the STATIC per-term offset
     o_m = (96 m) % 128 in {0, 32, 64, 96}. The extended window is
     pre-arranged host-side as FOUR sliding matrices R_o[q, l] =
     ext[128 q + o + l] (one per offset class), so the chunk aligned at
     start_m - r0 (r0 = pos % 128, the SAME for every term of a survivor)
     is one row of R_{o_m}: row q_m = pos//128 + 6m + (96m)//128. Each
     term block extracts with one one-hot (SB, 96) x (96, 2048) MXU matmul
     against its (static) class table.
  2. gamma-mix + pattern sum — per-term complex scalar multiply (lane
     thresholds, shifted by +r0, pick the wrap power), accumulated into ONE
     (SB, 1024) frame sum. Because all terms share the residual r0, the sum
     happens BEFORE any residual alignment.
  3. residual shift — ONE 7-level bit-decomposed lane-roll dance on the
     summed (SB, 1024) block. (Round 2 rolled every (term, survivor) chunk
     — 3.5x the rows; measured 0.145 ms of the 0.228 ms kernel,
     tools/_demod_ablate_r3.py.)
  4. carrier — W[f, 128 j + r] = W[f, 128 j] * W[f, r] exactly, so the row
     is built from 7 + 128 per-survivor table values (already fetched by
     survivor_params' packed row select) as seven broadcast complex
     products — no (SB, F) x (F, 896) matmul over the full frequency grid.
  5. matched filter + tail — identical code path to pallas_demod.py
     (_dot_mf + mf_tail) with the re/im planes stacked into one matmul.

Unlike the full kernel there is no per-(freq, pattern) shift dance: the
pattern sum collapses into gamma, so gap patterns cost nothing special.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .pallas_demod import (_dot_mf, _dot_onehot, _lane_masks, _mf_matrix,
                           mf_tail)
from .tables import FreqTables, cached_freq_tables

_N = C.WINDOW_LEN  # 5184
_M = C.PATTERN_LEN  # 6 frame slots per pattern mask
_CHUNK = 1024
_MFK = 896
# extended window: [c, c, c[:1024]] covers every chunk index
# pos + 864m + l <= (N-1) + 864*5 + 1023 = 10526 < 2N + 1024 = 11392
_EXT_LEN = 2 * _N + _CHUNK
_CROWS = 96  # rows per offset-class sliding matrix (q <= 73 ever selected)
_OFFS = (0, 32, 64, 96)  # offset classes: (96 m) % 128 for m in 0..5


def _term_geometry(m: int) -> tuple[int, int]:
    """Static per-term extraction geometry: (row offset q_m - pos//128,
    offset-class index). 864 m = 128*(6m + c) + o with o = (96m) % 128."""
    c, o = divmod(96 * m, 128)
    return 6 * m + c, _OFFS.index(o)


def _ext_window(c: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """(N,) complex -> (384, 2048) sliding matrices, re | im.

    Four stacked 96-row blocks, one per offset class o in {0, 32, 64, 96}:
    block row q holds ext[128 q + o : 128 q + o + 1024] (ext = c cyclically
    extended), so a chunk aligned at 128 q + o is exactly one row. Each block
    is built as 8 static lane-concatenated slices of the (96, 128) tiling —
    pure layout copies, no gather. Rows past 73 are never selected
    (q = pos//128 + 6m + c <= 40 + 33); they carry wrapped/zero filler."""
    pad_len = _CROWS * 128 + _OFFS[-1] - _EXT_LEN
    # cast the 1-D planes FIRST (native mode: bf16): every slice copy below
    # then moves half the bytes
    er = jnp.real(c).astype(dtype)
    ei = jnp.imag(c).astype(dtype)
    planes = []
    for x in (er, ei):
        ext = jnp.concatenate([x, x, x[:_CHUNK],
                               jnp.zeros((pad_len,), dtype)])
        blocks = []
        for o in _OFFS:
            tile = ext[o : o + _CROWS * 128].reshape(_CROWS, 128)
            r = jnp.concatenate(
                [tile[j : j + _CROWS - 8, :] for j in range(8)],
                axis=1)  # (88, 1024): row q = ext[128q+o : +1024]
            blocks.append(jnp.concatenate(
                [r, jnp.zeros((_CROWS - r.shape[0], 1024), dtype)]))
        planes.append(jnp.concatenate(blocks, axis=0))  # (384, 1024)
    return jnp.concatenate(planes, axis=1)


def _mask_pick(rows: jnp.ndarray, idx: jnp.ndarray, n: int) -> jnp.ndarray:
    """rows (S, n), idx (S,) -> rows[s, idx[s]] via compare+sum (XLA's TPU
    take_along_axis lowers to a scalar-core gather; this stays on the VPU)."""
    hit = idx[:, None] == jnp.arange(n, dtype=jnp.int32)
    return jnp.sum(jnp.where(hit, rows, 0.0), axis=1)


_WQ_COLS = (_N - 1) // 128 + 1  # 41 row-aligned W powers


def survivor_params(pos_s, f_idx, p_idx, W, chi,
                    terms: tuple[int, ...] | None = None,
                    fast: bool = False):
    """Per-survivor kernel operands from exact table values.

    pos_s/f_idx/p_idx: (S,) int32. W: (F, N) complex64 mix table,
    chi: (F,) complex64 wrap correction (tables.py). Returns
    (ints (S, T, 4) int32 [q_m, r0, t1, t2], gam (S, T, 6) f32
    [gre0 gre1 gre2 gim0 gim1 gim2], car (S, 270) f32 carrier factors
    [W[f,128j] re 0:7 | im 7:14 | W[f,r] re 14:142 | im 142:270] from which
    the kernel rebuilds W[f, l<896] as W[f,128j]*W[f,r] — one f32 product
    off the exact table value, same order as the gamma products).

    terms optionally lists the ACTIVE frame offsets m (the nonzero positions
    of the pattern mask — STATIC per call: the tiered pipeline runs one call
    per pattern); gamma then carries an implicit mask of 1 per term. Without
    it T = 6 with the pattern-mask zeros folded into gamma — identical sums
    (adding exact zeros), ~2x the kernel rows on the average pattern mix.

    q_m = pos//128 + 6m + (96m)//128 indexes the offset-class sliding matrix
    R_{o_m} (see _ext_window); the wrap thresholds t1/t2 are in ALIGNED lane
    coordinates (start_m - r0 + lane), i.e. shifted by +r0 vs the logical
    frame position.

    All frequency-indexed tables ride ONE one-hot row-select matmul over a
    packed (F, cols) matrix (per-survivor scalar gathers ran on the TPU
    scalar core, ~0.04 ms/win); W[f, pos] splits as W[f, 128q]*W[f, r]
    (one extra f32 product, same order as the existing gamma products).
    """
    S = pos_s.shape[0]
    m_list = tuple(range(_M)) if terms is None else tuple(terms)
    m = jnp.asarray(np.array(m_list, np.int32))[None, :]  # (1, T)
    geo = np.array([_term_geometry(mm)[0] for mm in m_list], np.int32)
    start = pos_s[:, None] + 864 * m  # (S, T)
    q0 = pos_s // 128
    r0 = pos_s % 128
    q_m = q0[:, None] + geo[None, :]
    t1 = jnp.clip(_N - start + r0[:, None], 0, _CHUNK)
    t2 = jnp.clip(2 * _N - start + r0[:, None], 0, _CHUNK)
    ints = jnp.stack(
        [q_m, jnp.broadcast_to(r0[:, None], q_m.shape), t1, t2],
        axis=-1).astype(jnp.int32)

    # packed per-frequency matrix: [Wq | Wr | t864 | phi] re/im planes
    wq = W[:, ::128][:, :_WQ_COLS]  # (F, 41)
    wr = W[:, :128]  # (F, 128)
    t864_t = W[:, :: C.FRAME_LEN][:, :_M]  # (F, 6) = W[f, 864m], 864*5 < N
    phi_t = jnp.conj(1.0 + chi)[:, None]  # (F, 1) exp(+2j pi f N / fs)
    fm = jnp.concatenate(
        [wq.real, wq.imag, wr.real, wr.imag,
         t864_t.real, t864_t.imag, phi_t.real, phi_t.imag],
        axis=1).astype(jnp.float32)  # (F, 352)
    oh = (f_idx[:, None] == jnp.arange(W.shape[0], dtype=jnp.int32)
          ).astype(jnp.float32)
    # native mode: 1-pass bf16 table fetch — gamma/carrier phases round to
    # ~2^-8 ANYWAY in the bf16 mix products; a +-0.6 deg phase jitter costs
    # < 0.01 dB of 6-frame coherent-averaging gain (sensitivity floor
    # re-validated identical)
    prec = (jax.lax.Precision.DEFAULT if fast
            else jax.lax.Precision.HIGH)
    rows = jnp.matmul(oh, fm, precision=prec)  # (S, 352)

    wq_s = jax.lax.complex(_mask_pick(rows[:, 0:41], q0, _WQ_COLS),
                           _mask_pick(rows[:, 41:82], q0, _WQ_COLS))
    wr_s = jax.lax.complex(_mask_pick(rows[:, 82:210], r0, 128),
                           _mask_pick(rows[:, 210:338], r0, 128))
    w_pos = wq_s * wr_s  # (S,) = W[f, pos] up to one f32 product
    t864_all = jax.lax.complex(rows[:, 338:344], rows[:, 344:350])  # (S, 6)
    phi = jax.lax.complex(rows[:, 350], rows[:, 351])  # (S,)

    if terms is None:
        t864 = t864_all
        pm = jnp.asarray(C.PATTERN_MASKS.astype(np.float32))  # (8, 6)
        hitp = p_idx[:, None] == jnp.arange(pm.shape[0], dtype=jnp.int32)
        masks = jnp.sum(jnp.where(hitp[:, :, None], pm[None, :, :], 0.0),
                        axis=1)
    else:
        t864 = t864_all[:, list(m_list)]
        masks = jnp.ones((S, len(m_list)), jnp.float32)

    g0 = masks.astype(w_pos.dtype) * w_pos[:, None] * t864  # (S, T)
    g1 = g0 * phi[:, None]
    g2 = g1 * phi[:, None]
    gam = jnp.stack(
        [g0.real, g1.real, g2.real, g0.imag, g1.imag, g2.imag],
        axis=-1).astype(jnp.float32)  # (S, T, 6)
    car = jnp.concatenate(
        [rows[:, 0:7], rows[:, 41:48], rows[:, 82:210], rows[:, 210:338]],
        axis=1)  # (S, 270)
    return ints, gam, car


def _survivor_kernel(sb_blk: int, m_list: tuple, mf_mode: str, exact3: bool,
                     win_blk: int,
                     c_ri, car_ref, ints_ref, gam_ref,
                     m_ref, m_h, m_l, masks_ref,
                     sb_out, nbad_out, ch_scr):
    """One grid step = win_blk windows x sb_blk survivors (rows win-major
    within each term block). Everything after extraction is row-parallel, so
    stacking windows amortizes the kernel's op-dispatch overhead (the
    dominant cost at sb_blk ~ 176: ~100 vector ops per (window, tier) when
    win_blk = 1 — tools/_demod_ablate_r3.py)."""
    n_terms = len(m_list)
    rows = win_blk * sb_blk
    fast = mf_mode == "fast"
    # fast_math: all frame data in bf16 (half the VMEM traffic through the
    # mix/roll/carrier chain, 1-pass extraction/MF matmuls); softbit error
    # ~2^-8 relative — LLR-level noise the BP absorbs (deep-scan decode
    # floor measured identical to the exact path, ARCHITECTURE.md)
    ftype = jnp.bfloat16 if fast else jnp.float32
    lane96 = jax.lax.broadcasted_iota(jnp.int32, (sb_blk, _CROWS), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _CHUNK), 1)

    # ---- per-term: one-hot extraction off the term's offset-class matrix
    # (per window, into the scratch), gamma-mix with wrap thresholds on the
    # stacked rows, accumulate the pattern sum -----------------------------
    ar = ai = None
    for j, m in enumerate(m_list):
        base = j * rows
        cls = _term_geometry(m)[1]
        for w in range(win_blk):
            rs = slice(base + w * sb_blk, base + (w + 1) * sb_blk)
            qcol = ints_ref[rs, 0:1]  # (SB, 1): row in window w's R_cls
            oh = jnp.where(qcol == lane96, 1.0, 0.0)
            blk = w * 4 * _CROWS + cls * _CROWS
            if fast:
                ch_w = jnp.dot(oh.astype(jnp.bfloat16),
                               c_ri[blk : blk + _CROWS, :],
                               preferred_element_type=jnp.float32
                               ).astype(jnp.bfloat16)
            else:
                ch_w = _dot_onehot(oh, c_ri[blk : blk + _CROWS, :], exact3)
            if win_blk == 1:
                ch = ch_w
            else:
                ch_scr[w * sb_blk : (w + 1) * sb_blk, :] = ch_w
        if win_blk > 1:
            ch = ch_scr[:, :]
        chr_ = ch[:, :_CHUNK]
        chi_ = ch[:, _CHUNK:]
        rs_all = slice(base, base + rows)
        t1 = ints_ref[rs_all, 2:3]
        t2 = ints_ref[rs_all, 3:4]
        g = gam_ref[rs_all, :]

        def pick(k0, k1, k2):
            # the lane-threshold selects run in 32-bit (Mosaic cannot mix a
            # 32-bit compare mask with 16-bit operands); one cast after
            a = jnp.where(lane < t1, g[:, k0 : k0 + 1], g[:, k1 : k1 + 1])
            return jnp.where(lane < t2, a, g[:, k2 : k2 + 1]).astype(ftype)

        gre = pick(0, 1, 2)
        gim = pick(3, 4, 5)
        zr = chr_ * gre - chi_ * gim  # (rows, 1024)
        zi = chr_ * gim + chi_ * gre
        if ar is None:
            ar, ai = zr, zi
        else:
            ar = ar + zr
            ai = ai + zi

    # ---- residual shift: ONE bit-decomposed lane-roll dance on the summed
    # frames (r0 = pos % 128 is shared by every term of a survivor). The
    # re/im planes ride ONE row-stacked block so each level is one roll +
    # one select instead of two (the dance is op-dispatch-bound; the stack
    # copy is a single cheap pass) ----------------------------------------
    rcol = ints_ref[0:rows, 1:2]
    # Mosaic rotate is 32-bit only. Native mode: pack the bf16 re/im pair
    # into ONE i32 lane (both planes roll by the same amount) — half the
    # roll traffic and op count; bit-exact (pure bit movement). Exact mode:
    # roll the f32 planes row-stacked.
    if fast:
        au = jax.lax.bitcast_convert_type(ar, jnp.uint16).astype(jnp.uint32)
        bu = jax.lax.bitcast_convert_type(ai, jnp.uint16).astype(jnp.uint32)
        a2 = ((au << 16) | bu).astype(jnp.int32)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            take = (rcol & bit) != 0
            a2 = jnp.where(take, pltpu.roll(a2, _CHUNK - bit, 1), a2)
        ru = a2.astype(jnp.uint32)
        # only lanes < _MFK survive into the matched filter (M rows >= 864
        # are zero); the roll needed the full 1024 (sources span lanes up
        # to 896+127)
        ar = jax.lax.bitcast_convert_type(
            (ru >> 16).astype(jnp.uint16), jnp.bfloat16)[:, :_MFK]
        ai = jax.lax.bitcast_convert_type(
            (ru & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)[:, :_MFK]
    else:
        a2 = jnp.concatenate([ar, ai], axis=0).astype(jnp.float32)
        take2 = jnp.concatenate([rcol, rcol], axis=0)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            take = (take2 & bit) != 0
            a2 = jnp.where(take, pltpu.roll(a2, _CHUNK - bit, 1), a2)
        ar = a2[:rows, :_MFK]
        ai = a2[rows:, :_MFK]

    # ---- carrier W[f, 128j + r] = W[f, 128j] * W[f, r] -----------------
    # car_ref columns: [wq re 0:7 | wq im 7:14 | wr re 14:142 | wr im 142:270]
    car = car_ref[:, :].astype(ftype)
    wrre = car[:, 14:142]
    wrim = car[:, 142:270]
    wbr, wbi = [], []
    for j in range(_MFK // 128):
        qr = car[:, j : j + 1]
        qi = car[:, 7 + j : 8 + j]
        wbr.append(qr * wrre - qi * wrim)
        wbi.append(qr * wrim + qi * wrre)
    w_re = jnp.concatenate(wbr, axis=1)  # (rows, 896)
    w_im = jnp.concatenate(wbi, axis=1)
    fr = ar * w_re - ai * w_im
    fi = ar * w_im + ai * w_re

    # ---- matched filter + shared tail (re/im stacked: one matmul) ------
    stacked = jnp.concatenate([fr, fi], axis=0)
    if fast:
        AB = jnp.dot(stacked, m_h[:, :], preferred_element_type=jnp.float32)
    else:
        AB = _dot_mf(stacked, m_ref[:, :], m_h, m_l, mf_mode)
    A = AB[:rows, :]
    Bm = AB[rows:, :]
    sb_scaled, nbad = mf_tail(A, Bm, masks_ref)
    sb_out[:, :] = sb_scaled
    nbad_out[:, 0:1] = nbad.astype(jnp.int32)


def demod_survivors(c: jnp.ndarray, freqs, pos_s: jnp.ndarray,
                    f_idx: jnp.ndarray, p_idx: jnp.ndarray,
                    interpret: bool | None = None,
                    fast_math: bool = False,
                    sb_blk: int = 128,
                    terms: tuple[int, ...] | None = None,
                    win_blk: int = 1,
                    ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Demodulate S prefiltered candidates per window.

    c: (N,) complex64 analytic window, or (B, N) for a WINDOW BATCH (then
    pos_s/f_idx/p_idx are (B, S), S == sb_blk required, and each grid step
    processes win_blk windows — the kernel is op-dispatch-bound, so stacking
    windows is ~win_blk x cheaper than vmap'ing). freqs: static tuple or
    FreqTables. pos_s/f_idx/p_idx: (S,) int32, S a multiple of sb_blk.
    terms optionally lists the survivors' active frame offsets as a STATIC
    tuple (the tiered path: a pattern-p batch only pays for its
    popcount(mask_p) frames instead of 6; every survivor in the call must
    share the pattern).
    Returns (softbits (..., S, 128) f32, nbadsync (..., S) int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(freqs, FreqTables):
        W = freqs.W
        chi = freqs.chi[0]
    else:
        t = cached_freq_tables(tuple(float(f) for f in freqs))
        W = jnp.asarray(t.W)
        chi = jnp.asarray(t.chi[0])

    batched = c.ndim == 2
    if not batched:
        c = c[None]
        pos_s, f_idx, p_idx = pos_s[None], f_idx[None], p_idx[None]
        win_blk = 1
    B = c.shape[0]
    S = pos_s.shape[1]
    assert S % sb_blk == 0, (S, sb_blk)
    assert B % win_blk == 0, (B, win_blk)
    if win_blk > 1:
        assert S == sb_blk, (S, sb_blk)
    inner = S // sb_blk  # sub-steps within one window (1 on the tiered path)
    gsteps = (B // win_blk) * inner
    m_list = tuple(range(_M)) if terms is None else tuple(terms)
    n_terms = len(m_list)

    fast_params = fast_math and not (interpret or False)
    ints, gam, car = jax.vmap(
        lambda a, b, d: survivor_params(a, b, d, W, chi, terms,
                                        fast=fast_params)
    )(pos_s, f_idx, p_idx)  # (B, S, T, cols)

    # per-step rows: term-major, window-major within each term block:
    # row = ((step*T + j) * win_blk + w_local) * sb_blk + s_local
    def rows_mmajor(a):  # (B, S, T, cols) -> (gsteps*T*win_blk*SB, cols)
        cols = a.shape[-1]
        r = a.reshape(B // win_blk, win_blk, inner, sb_blk, n_terms, cols)
        r = r.transpose(0, 2, 4, 1, 3, 5)  # (grp, inner, T, w, SB, cols)
        return r.reshape(-1, cols)

    def pad128(a, to: int = 128):
        w = -a.shape[-1] % to
        return jnp.concatenate(
            [a, jnp.zeros(a.shape[:-1] + (w,), a.dtype)], axis=-1)

    ints_rows = pad128(rows_mmajor(ints))
    gam_rows = pad128(rows_mmajor(gam))
    car_rows = pad128(car.reshape(B * S, car.shape[-1]))  # (B*S, 384)

    mf_mode = "f32" if interpret else ("fast" if fast_math else "exact3")
    # native mode: bf16 sliding matrices (half the build and VMEM traffic,
    # no in-kernel casts)
    cr_dtype = jnp.bfloat16 if mf_mode == "fast" else jnp.float32
    c_ri = jax.vmap(lambda w: _ext_window(w, cr_dtype))(c).reshape(
        B * 4 * _CROWS, 2048)

    M = _mf_matrix()
    mh = M.astype(np.float32).astype(jnp.bfloat16)
    ml = (M - np.asarray(mh, np.float32)).astype(jnp.bfloat16)
    even, in144, ssign = _lane_masks()
    masks = np.concatenate([even, in144, ssign], axis=0)
    masks = np.concatenate([masks, np.zeros((5, 256), np.float32)], axis=0)

    exact3 = not interpret
    kernel = functools.partial(_survivor_kernel, sb_blk, m_list, mf_mode,
                               exact3, win_blk)
    const = lambda r, cc: pl.BlockSpec((r, cc), lambda s: (0, 0),
                                       memory_space=pltpu.VMEM)
    rows = n_terms * win_blk * sb_blk
    out_rows = win_blk * sb_blk
    inner_ = inner  # capture for index maps
    sb, nbad128 = pl.pallas_call(
        kernel,
        grid=(gsteps,),
        in_specs=[
            pl.BlockSpec((win_blk * 4 * _CROWS, 2048),
                         lambda s: (s // inner_, 0),
                         memory_space=pltpu.VMEM),  # offset-class matrices
            pl.BlockSpec((out_rows, 384), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # carrier factors
            pl.BlockSpec((rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # ints
            pl.BlockSpec((rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),  # gamma
            const(_MFK, 256),  # matched filter f32
            const(_MFK, 256),  # matched filter bf16 high
            const(_MFK, 256),  # matched filter bf16 low
            const(8, 256),  # lane masks
        ],
        out_specs=[
            pl.BlockSpec((out_rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((out_rows, 128), lambda s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * S, 128), jnp.float32),
            jax.ShapeDtypeStruct((B * S, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((out_rows if win_blk > 1 else 8, 2048),
                       jnp.bfloat16 if (fast_math and not interpret)
                       else jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(c_ri, car_rows, ints_rows, gam_rows,
      M, np.asarray(mh), np.asarray(ml), masks)
    sb = sb.reshape(B, S, 128)
    nbad = nbad128[:, 0].reshape(B, S)
    if not batched:
        return sb[0], nbad[0]
    return sb, nbad


def demod_survivors_ref(c: jnp.ndarray, freqs, pos_s, f_idx, p_idx,
                        terms: tuple[int, ...] | None = None):
    """Pure-jnp reference of the gamma-factorized survivor demod (same math
    as the kernel up to float association; used for parity tests and as the
    non-Pallas fallback when a prefilter is configured off-TPU)."""
    if isinstance(freqs, FreqTables):
        W = freqs.W
        chi = freqs.chi[0]
    else:
        t = cached_freq_tables(tuple(float(f) for f in freqs))
        W = jnp.asarray(t.W)
        chi = jnp.asarray(t.chi[0])

    m_list = tuple(range(_M)) if terms is None else tuple(terms)
    ints, gam, _ = survivor_params(pos_s, f_idx, p_idx, W, chi, terms)
    ext = jnp.concatenate([c, c, c[:_CHUNK], jnp.zeros((_OFFS[-1],), c.dtype)])
    offs = np.array([_OFFS[_term_geometry(m)[1]] for m in m_list], np.int32)
    start_al = ints[..., 0] * 128 + offs[None, :]  # (S, T) = start_m - r0
    idx = start_al[..., None] + jnp.arange(_CHUNK)[None, None, :]
    ch = ext[idx]  # (S, T, 1024) complex
    lane = jnp.arange(_CHUNK)[None, None, :]
    k = ((lane >= ints[..., 2:3]).astype(jnp.int32)
         + (lane >= ints[..., 3:4]).astype(jnp.int32))  # (S, T, 1024)
    gre = jnp.take_along_axis(gam[..., 0:3], k[..., :], axis=-1)
    gim = jnp.take_along_axis(gam[..., 3:6], k[..., :], axis=-1)
    g = jax.lax.complex(gre, gim)
    summed = jnp.sum(ch * g, axis=1)  # (S, 1024), aligned at start - r0
    r0 = ints[:, 0, 1]  # (S,)
    lam = r0[:, None] + jnp.arange(C.FRAME_LEN)[None, :]
    frame = jnp.take_along_axis(summed, lam, axis=1)  # (S, 864)
    frame = frame * W[f_idx, : C.FRAME_LEN]

    from .softbits import demod

    return demod(frame)
