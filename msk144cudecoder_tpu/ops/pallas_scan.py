"""Fused Pallas TPU kernel for the wideband sync scan.

One kernel fuses what the jnp path (ops/scan.py) leaves to XLA as separate
HBM-level ops: the (N, 42) x (42, F) sync-correlation matmuls, the wrap
correction, the per-pattern roll-combines, |s| metric, per-256-lag slice
maxima, and the top-8 slice selection — per frequency tile, entirely in VMEM.
The (P, N, F) metric field that dominates the jnp path's HBM traffic is never
materialized.

Math identical to ops/scan.py (same factorization of the reference
/root/reference/src/scan_kernel.cuh:27-366); complex arrays travel as
separate re/im float32 planes (Pallas TPU has no complex dtype).

Layout per grid step (frequency tile of 128 lanes):
  cmat  (N, 42) x2    lag matrix of the window (shared across tiles)
  bnd   (41, 42) x2   wrapped-tap boundary matrix
  B     (42, Ft) x2   sync template x carrier tones
  E     (N, Ft) x2    lag phase ramp
  chi   (1, Ft) x2    wrap correction
  out   pos/xb (Ft, P, 8)
Patterns 0..5 are prefix sums of per-frame terms; gap patterns 6..7 are
recomputed from their three terms (msk_context.cuh:231-240).

Hot-loop structure (chosen by measured VPU pass count on v5e):
  G = E * r  is the true cyclic correlation field — exactly N-periodic, so
  every subsequent cyclic roll of it needs NO wrap correction. The two sync
  offsets of each averaged frame collapse into one roll via
     q = G + roll(G, -336)
     T_m = roll(q, -864m)        (rolls compose cyclically)
  so each pattern term costs a single uncorrected roll per plane. The metric
  is kept SQUARED through slice-max/top-8 (monotone); one sqrt on the
  (P*8, Ft) output block. A scalar-coefficient variant that factors E out of
  the rolls entirely was measured slower (0.243 -> 0.218 -> this: the
  per-element wrap-boundary selects cost more VPU passes than the one-time
  E multiply).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from .tables import FreqTables, cached_freq_tables

_N = C.WINDOW_LEN
_NC = C.NUM_CANDIDATES_PER_PATTERN  # 8
_SLICES = C.NUM_SCAN_SLICES  # 21
_SLICE = C.SCAN_SLICE  # 256
_F_TILE = 128  # frequency lanes per grid step (Mosaic requires 128-wide lane
# blocks; VMEM pressure from the (5184, 128) plane set is covered by the
# raised vmem_limit_bytes and the incremental roll accumulation below)

# Pattern terms: pattern p sums T_m over these frame indices m.
_PATTERN_TERMS = [tuple(np.nonzero(C.PATTERN_MASKS[p])[0]) for p in range(8)]


def _split2(x):
    """2-way bf16 split: x ~= h + l (16 leading mantissa bits)."""
    h = x.astype(jnp.bfloat16)
    l = (x - h.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, l


def _cmm(cr, ci, br, bi, mm_mode: str):
    """conj(cr + i ci) @ (br + i bi) -> (re, im) via 3-matmul Karatsuba:
    m1 = cr@br, m2 = ci@bi, m3 = (cr-ci)@(br+bi); re = m1+m2,
    im = m3 - m1 + m2. Precision ladder ('f32' = plain HIGHEST dots, used
    in interpreter mode and as the exactness reference; 'split2' = each real
    matmul as 3 bf16 passes over 2-way operand splits, ~2^-16 relative —
    the TPU default: xb is a ranking metric, slice-max gaps dwarf 1e-4
    relative noise; 'fast' = 1-pass bf16, the fast_math option). Karatsuba
    + split2 is 9 MXU passes vs 24 for the 4-matmul HIGHEST form (measured
    0.13 ms/win of the 0.20 ms scan kernel on v5e, tools/_scan_ablate_r3)."""
    if mm_mode == "f32":
        hi = jax.lax.Precision.HIGHEST
        mm = lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32,
                                  precision=hi)
        re = mm(cr, br) + mm(ci, bi)
        im = mm(cr, bi) - mm(ci, br)
        return re, im
    if mm_mode == "fast":
        mm = lambda a, b: jnp.dot(a.astype(jnp.bfloat16),
                                  b.astype(jnp.bfloat16),
                                  preferred_element_type=jnp.float32)
    else:  # split2
        def mm(a, b):
            ah, al = _split2(a)
            bh, bl = _split2(b)
            d = lambda x, y: jnp.dot(x, y, preferred_element_type=jnp.float32)
            return d(ah, bh) + d(ah, bl) + d(al, bh)
    m1 = mm(cr, br)
    m2 = mm(ci, bi)
    m3 = mm(cr - ci, br + bi)
    return m1 + m2, m3 - m1 + m2


_DNT = (((0,), (0,)), ((), ()))  # contract sublane dims: (L, N)^T @ (L, Ft)


def _cmmT(planes, bops, mm_mode: str):
    """conj(c) @ B via sublane-contracting dot_general on ROW-BUILT lag
    planes (no gather, no in-kernel splits — both operands arrive pre-split;
    see lag_planes/_b_operands). planes rows: [cr, ci, cd=cr-ci] (f32/fast)
    or h/l pairs of those (split2); bops rows: [br, bi, bs=br+bi] likewise.
    Same Karatsuba combination as _cmm."""
    if mm_mode == "f32":
        hi = jax.lax.Precision.HIGHEST
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=_DNT,
            preferred_element_type=jnp.float32, precision=hi)
        m1 = d(planes[0], bops[0])
        m2 = d(planes[1], bops[1])
        m3 = d(planes[2], bops[2])
    else:
        d = lambda a, b: jax.lax.dot_general(
            a, b, dimension_numbers=_DNT,
            preferred_element_type=jnp.float32)
        if mm_mode == "fast":
            m1 = d(planes[0], bops[0])
            m2 = d(planes[1], bops[1])
            m3 = d(planes[2], bops[2])
        else:  # split2: rows 2k = high, 2k+1 = low parts
            def mm(k):
                ah, al = planes[2 * k], planes[2 * k + 1]
                bh, bl = bops[2 * k], bops[2 * k + 1]
                return d(ah, bh) + d(ah, bl) + d(al, bh)
            m1 = mm(0)
            m2 = mm(1)
            m3 = mm(2)
    return m1 + m2, m3 - m1 + m2


def _scan_kernel(scan_depth: int, num_cand: int, mm_mode: str, dec: int,
                 planes_ref, bnd_ri, bops_ref,
                 b_re, b_im, e_re, e_im, chi_re, chi_im,
                 pos_out, xb_out):
    ft = b_re.shape[1]
    n2 = _N // dec  # decimated lag-grid length (dec | N)
    slice2 = _SLICE // dec  # coarse lags per 256-lag slice
    pad2 = _SLICES * slice2
    nb = bnd_ri.shape[0]  # boundary rows on this grid (41 / 20 / 10)

    # --- r = conj(c) @ B (transposed lag planes) + wrap correction ------
    r_re, r_im = _cmmT(planes_ref, bops_ref, mm_mode)

    # bnd packs [re | im] in one lane-padded buffer (42+42 <= 128 lanes)
    br, bi = b_re[:], b_im[:]
    bdr = bnd_ri[:, : C.SYNC_CORR_LEN]
    bdi = bnd_ri[:, C.SYNC_CORR_LEN : 2 * C.SYNC_CORR_LEN]
    dr, di = _cmm(bdr, bdi, br, bi, mm_mode)  # (nb, Ft)
    xr, xi = chi_re[:], chi_im[:]  # (1, Ft)
    corr_re = xr * dr - xi * di
    corr_im = xr * di + xi * dr
    tail = n2 - nb
    # (scatter-add is not lowerable in Pallas TPU; use slice + concat)
    r_re = jnp.concatenate([r_re[:tail, :], r_re[tail:, :] + corr_re], axis=0)
    r_im = jnp.concatenate([r_im[:tail, :], r_im[tail:, :] + corr_im], axis=0)

    # --- G = E * r: exactly N-periodic, rolls below need no correction --
    # (on the decimated grid: every roll amount below — 336 and 864m — is
    # divisible by dec, so the coarse grid is CLOSED under the pattern
    # rolls and the decimated field is exact at its lags)
    er, ei = e_re[:], e_im[:]
    g_re = er * r_re - ei * r_im
    g_im = er * r_im + ei * r_re

    def rolled(x_re, x_im, a: int):
        """y[l] = x[(l + a) mod N] on the decimated grid (dec | a)."""
        s = (-(a // dec)) % n2
        return pltpu.roll(x_re, s, 0), pltpu.roll(x_im, s, 0)

    # q: both sync offsets of frame 0 combined; T_m = roll(q, -864m)
    q3_re, q3_im = rolled(g_re, g_im, C.SECOND_SYNC_SAMPLE)
    q_re = g_re + q3_re
    q_im = g_im + q3_im

    def term(m: int):
        return rolled(q_re, q_im, 864 * m)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SLICES, ft), 0)
    # packed slice-max key: |s|^2 >= 0, so its int32 bitcast is
    # order-isomorphic; the low log2(slice2) mantissa bits carry the
    # INVERTED in-slice lag (lagbits - lag), so one int max yields
    # (quantized max, argmax) in a single reduction pass — inverted so
    # quantized ties resolve to the SMALLEST lag, matching jnp.argmax-first
    # semantics. Metric quantization is <= 2^-16 relative on |s|^2
    # (<= 2^-17 on xb) at dec=1, half/quarter that at dec 2/4 — far inside
    # the slice-max gaps the ranking depends on.
    lagbits = slice2 - 1  # 255 / 127 / 63
    inv_lag = lagbits - jax.lax.broadcasted_iota(jnp.int32, (slice2, ft), 0)

    def select(s_re, s_im, p: int):
        """Slice-max + top-8 for pattern p; writes pos/xb output rows.
        Metric is |s|^2 (sqrt deferred to the output block — monotone)."""
        xb = s_re * s_re + s_im * s_im  # (n2, Ft)
        # pad lag axis to 21*slice2 by wrapping the head
        # (scan_kernel.cuh:85-89); per-slice max via 21 static row slices
        # (Mosaic cannot reshape (pad2, ft) -> (21, slice2, ft))
        pad = xb[: pad2 - n2, :]
        xbp = jnp.concatenate([xb, pad], axis=0)  # (pad2, Ft)
        maxs = []
        for s in range(_SLICES):
            seg = xbp[s * slice2 : (s + 1) * slice2, :]  # (slice2, Ft)
            key = jax.lax.bitcast_convert_type(seg, jnp.int32)
            key = (key & ~lagbits) | inv_lag
            maxs.append(jnp.max(key, axis=0, keepdims=True))
        smax = jnp.concatenate(maxs, axis=0)  # (21, Ft) packed int keys

        # top-k slices per freq (descending xb): repeated max + mask-out
        # (Mosaic argmax is f32-only; equality + min-index keeps argmax-first
        # semantics on the int keys — all ops here are on (21, Ft))
        cur = smax
        for k in range(num_cand):
            best = jnp.max(cur, axis=0, keepdims=True)  # (1, Ft) packed
            hit = cur == best
            bslice = jnp.min(jnp.where(hit, lane_iota, _SLICES), axis=0)
            chosen = hit & (lane_iota == bslice[None, :])
            lag_in_slice = lagbits - (best[0, :] & lagbits)
            pos = (dec * (bslice * slice2 + lag_in_slice)) % _N
            row = p * num_cand + k
            pos_out[row : row + 1, :] = pos[None, :]
            xb_out[row : row + 1, :] = jax.lax.bitcast_convert_type(
                best & ~lagbits, jnp.float32)
            cur = jnp.where(chosen, jnp.int32(-(2 ** 31)), cur)

    # prefix patterns 0..min(depth,6)-1; T_0 = q itself
    acc_re, acc_im = q_re, q_im
    select(acc_re, acc_im, 0)
    t3 = t4 = None
    for p in range(1, min(scan_depth, 6)):
        tre, tim = term(p)
        if p == 3 and scan_depth >= 7:
            t3 = (tre, tim)
        if p == 4 and scan_depth >= 8:
            t4 = (tre, tim)
        acc_re = acc_re + tre
        acc_im = acc_im + tim
        select(acc_re, acc_im, p)
    # gap patterns: 6 = frames {0,3}, 7 = frames {0,3,4}
    if scan_depth >= 7:
        s_re, s_im = q_re + t3[0], q_im + t3[1]
        select(s_re, s_im, 6)
        if scan_depth >= 8:
            select(s_re + t4[0], s_im + t4[1], 7)
    # metric was |s|^2 throughout; one sqrt on the small output block
    xb_out[:, :] = jnp.sqrt(xb_out[:, :])


_LROWS = 48  # lag-plane sublane pad: 42 taps -> multiple of 8 (zeros inert)


def lag_planes(c: jnp.ndarray, mm_mode: str, dec: int = 1) -> jnp.ndarray:
    """Transposed lag planes for _cmmT from one window (N,) complex.

    Returns (3, 48, N//dec) f32 [cr, ci, cd=cr-ci] for 'f32'/'fast' (cast to
    bf16 for 'fast'), or (6, 48, N//dec) bf16 h/l split pairs for 'split2'.
    Row i of a plane is ext[i : i+N : dec] — at dec=1, 42 contiguous slice
    copies, NO gather (the round-2 (N, 42) gather formulation cost
    0.033 ms/win on v5e; this is ~0.003, tools/_scan_mmT_probe.py). At
    dec>1 the ext array is de-interleaved ONCE into dec phase arrays (one
    reshape), after which each row is again a CONTIGUOUS phase slice:
    ext[i + dec*k] = phase[i % dec][i//dec + k]. (42 stride-dec row slices
    cost more than the full-resolution build — layout passes — measured in
    tools/_scan_r5_probe.py.)"""
    n2 = _N // dec
    ext = jnp.concatenate([c, c[: C.SYNC_CORR_LEN - 1]])
    er = ext.real
    ei = ext.imag
    ed = er - ei

    def rows(x):
        if dec == 1:
            m = jnp.stack([x[i : i + _N] for i in range(C.SYNC_CORR_LEN)])
        else:
            padlen = -x.shape[0] % dec
            xp = jnp.concatenate([x, jnp.zeros((padlen,), x.dtype)])
            ph = xp.reshape(-1, dec)  # ph[k, r] = x[dec*k + r]
            phases = [ph[:, r] for r in range(dec)]
            m = jnp.stack([
                phases[i % dec][i // dec : i // dec + n2]
                for i in range(C.SYNC_CORR_LEN)])
        return jnp.concatenate(
            [m, jnp.zeros((_LROWS - C.SYNC_CORR_LEN, n2), m.dtype)], axis=0)

    if mm_mode == "f32":
        return jnp.stack([rows(er), rows(ei), rows(ed)])
    if mm_mode == "fast":
        return jnp.stack([rows(er), rows(ei), rows(ed)]).astype(jnp.bfloat16)
    planes = []
    for x in (er, ei, ed):
        h, l = _split2_xla(x)
        planes += [rows(h), rows(l)]
    return jnp.stack(planes)


def _split2_xla(x):
    """2-way bf16 split OUTSIDE a Pallas kernel. The in-kernel idiom
    `x - x.astype(bf16).astype(f32)` is folded to ZERO by XLA under
    --xla_allow_excess_precision (this runtime sets it), silently dropping
    the low part; lax.reduce_precision is a dedicated HLO the folding
    cannot remove."""
    hf = jax.lax.reduce_precision(x, exponent_bits=8, mantissa_bits=7)
    return hf.astype(jnp.bfloat16), (x - hf).astype(jnp.bfloat16)


def _b_operands(B: np.ndarray | jnp.ndarray, mm_mode: str) -> jnp.ndarray:
    """Matching B-side operands: rows [br, bi, bs=br+bi] (f32/fast) or their
    h/l split pairs (split2), each padded to (48, Fp). B is the (42, Fp)
    complex sync-template x carrier-tone table (possibly traced)."""
    br = jnp.real(B).astype(jnp.float32)
    bi = jnp.imag(B).astype(jnp.float32)
    bs = br + bi

    def pad(x):
        return jnp.concatenate(
            [x, jnp.zeros((_LROWS - C.SYNC_CORR_LEN, x.shape[1]), x.dtype)])

    if mm_mode == "f32":
        return jnp.stack([pad(br), pad(bi), pad(bs)])
    if mm_mode == "fast":
        return jnp.stack([pad(br), pad(bi), pad(bs)]).astype(jnp.bfloat16)
    ops = []
    for x in (br, bi, bs):
        h, l = _split2_xla(x)
        ops += [pad(h), pad(l)]
    return jnp.stack(ops)


def lag_matrices(c: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(cmat_ri (..., N, 84), bnd_ri (..., 41, 84)) kernel operands from one
    window (N,) or a batch (B, N) of windows.

    SUPERSEDED by lag_planes for the scan kernel (the (N, 42) gather costs
    0.033 ms/win); kept for the boundary matrix and dev probes.
    """
    ext = jnp.concatenate([c, c[..., : C.SYNC_CORR_LEN - 1]], axis=-1)
    # gather the f32 planes, not the complex array: the complex gather's
    # strided .real/.imag extraction costs an extra layout pass per plane
    ext_re = ext.real
    ext_im = ext.imag
    idx = np.arange(_N)[:, None] + np.arange(C.SYNC_CORR_LEN)[None, :]
    cmat_ri = jnp.concatenate([ext_re[..., idx], ext_im[..., idx]], axis=-1)
    return cmat_ri, bnd_matrix(c)


def bnd_matrix(c: jnp.ndarray, dec: int = 1) -> jnp.ndarray:
    """(..., nb, 84) wrapped-tap boundary matrix [re | im] (the cyclic-wrap
    phase-correction operand; nb x 42 gather, small). Row r covers lag
    N-41+r; dec>1 keeps only the rows whose lag lies on the decimated grid
    (nb = 41 / 20 / 10 for dec = 1 / 2 / 4)."""
    r_all = np.arange(C.SYNC_CORR_LEN - 1)
    if dec > 1:
        r_all = r_all[(_N - (C.SYNC_CORR_LEN - 1) + r_all) % dec == 0]
    r = r_all[:, None]
    i = np.arange(C.SYNC_CORR_LEN)[None, :]
    wrapped = i >= (C.SYNC_CORR_LEN - 1) - r
    bidx = np.where(wrapped, r + i - (C.SYNC_CORR_LEN - 1), 0)
    wr = jnp.asarray(wrapped)
    c_re = c.real
    c_im = c.imag
    return jnp.concatenate([jnp.where(wr, c_re[..., bidx], 0.0),
                            jnp.where(wr, c_im[..., bidx], 0.0)], axis=-1)


def scan_pallas(c: jnp.ndarray, freqs, scan_depth: int,
                interpret: bool | None = None,
                fast_math: bool = False,
                num_cand: int = _NC,
                dec: int = 1,
                ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.scan.scan via the fused Pallas kernel.

    c: (5184,) complex64 window. freqs: tuple or FreqTables. Returns
    (pos, xb) each (F, scan_depth, k), F unpadded (k = num_cand, the
    cfg.candidates_per_pattern knob; reference fixes 8, common.h:34).
    interpret=None: auto (interpreter off TPU, compiled on TPU).
    dec (config.scan_decimation): correlate every dec-th lag only — the
    matmul rows, roll field and slice maxima all shrink by dec; candidate
    positions land on the coarse grid (same semantics as
    ops.scan.select_candidates with the same dec).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if isinstance(freqs, FreqTables):
        t = freqs
        f_total = t.B.shape[1]
    else:
        t = cached_freq_tables(tuple(float(f) for f in freqs))
        f_total = t.B.shape[1]
    n2 = _N // dec

    # pad the frequency axis to a full lane tile
    f_pad = -f_total % _F_TILE
    fp = f_total + f_pad

    def pad_f(a, axis):
        if f_pad == 0:
            return jnp.asarray(a)
        cfgpad = [(0, 0)] * a.ndim
        cfgpad[axis] = (0, f_pad)
        return jnp.pad(jnp.asarray(a), cfgpad)

    B = pad_f(t.B, 1)
    E = pad_f(t.E, 1)[::dec]  # lag phase ramp on the decimated grid
    chi = pad_f(t.chi, 1)

    mm_mode = "f32" if interpret else ("fast" if fast_math else "split2")
    planes = lag_planes(c, mm_mode, dec)
    bops = _b_operands(B, mm_mode)
    bnd_ri = bnd_matrix(c, dec)
    nb = bnd_ri.shape[0]

    n_tiles = fp // _F_TILE
    grid = (n_tiles,)

    def tile_spec(rows, blocked=True):
        if blocked:
            return pl.BlockSpec((rows, _F_TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, C.SYNC_CORR_LEN), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    nplanes = planes.shape[0]
    in_specs = [
        pl.BlockSpec((nplanes, _LROWS, n2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),   # transposed lag planes
        pl.BlockSpec((nb, 2 * C.SYNC_CORR_LEN),
                     lambda i: (0, 0), memory_space=pltpu.VMEM),  # bnd [re|im]
        pl.BlockSpec((nplanes, _LROWS, _F_TILE), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),   # B-side operands
        tile_spec(C.SYNC_CORR_LEN),     # B re
        tile_spec(C.SYNC_CORR_LEN),     # B im
        tile_spec(n2),                  # E re
        tile_spec(n2),                  # E im
        tile_spec(1),                   # chi re
        tile_spec(1),                   # chi im
    ]
    # outputs are (P*8, F) row-major inside the kernel (clean row stores;
    # Mosaic rejects per-(p,k) sublane scatter into an (F, P, 8) block)
    rows = scan_depth * num_cand
    out_specs = [
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, fp), jnp.int32),
        jax.ShapeDtypeStruct((rows, fp), jnp.float32),
    ]

    kernel = functools.partial(_scan_kernel, scan_depth, num_cand, mm_mode,
                               dec)
    pos, xb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        planes, bnd_ri, bops,
        B.real, B.imag, E.real, E.imag, chi.real, chi.imag,
    )
    pos = pos.reshape(scan_depth, num_cand, fp).transpose(2, 0, 1)
    xb = xb.reshape(scan_depth, num_cand, fp).transpose(2, 0, 1)
    return pos[:f_total], xb[:f_total]
