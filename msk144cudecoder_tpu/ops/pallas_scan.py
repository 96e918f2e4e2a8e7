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
_F_TILE = 128

# Pattern terms: pattern p sums T_m over these frame indices m.
_PATTERN_TERMS = [tuple(np.nonzero(C.PATTERN_MASKS[p])[0]) for p in range(8)]


def _scan_kernel(scan_depth: int,
                 cmat_re, cmat_im, bnd_re, bnd_im,
                 b_re, b_im, e_re, e_im, chi_re, chi_im,
                 pos_out, xb_out):
    ft = b_re.shape[1]

    # --- G = E * (conj(cmat) @ B + wrap correction) ---------------------
    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.float32)

    cr, ci = cmat_re[:], cmat_im[:]
    br, bi = b_re[:], b_im[:]
    r_re = mm(cr, br) + mm(ci, bi)  # conj(c) @ B, real
    r_im = mm(cr, bi) - mm(ci, br)  # imag

    dr = mm(bnd_re[:], br) + mm(bnd_im[:], bi)  # (41, Ft)
    di = mm(bnd_re[:], bi) - mm(bnd_im[:], br)
    xr, xi = chi_re[:], chi_im[:]  # (1, Ft)
    corr_re = xr * dr - xi * di
    corr_im = xr * di + xi * dr
    tail = _N - (C.SYNC_CORR_LEN - 1)
    # (scatter-add is not lowerable in Pallas TPU; use slice + concat)
    r_re = jnp.concatenate([r_re[:tail, :], r_re[tail:, :] + corr_re], axis=0)
    r_im = jnp.concatenate([r_im[:tail, :], r_im[tail:, :] + corr_im], axis=0)

    er, ei = e_re[:], e_im[:]
    g_re = er * r_re - ei * r_im
    g_im = er * r_im + ei * r_re

    # --- per-pattern metrics + candidate selection ----------------------
    def term(m: int):
        """T_m = roll(G, -864m) + roll(G, -(864m+336)) along the lag axis."""
        s1 = (-864 * m) % _N
        s2 = (-(864 * m + C.SECOND_SYNC_SAMPLE)) % _N
        tre = pltpu.roll(g_re, s1, 0) + pltpu.roll(g_re, s2, 0)
        tim = pltpu.roll(g_im, s1, 0) + pltpu.roll(g_im, s2, 0)
        return tre, tim

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SLICES, ft), 0)

    def select(s_re, s_im, p: int):
        """Slice-max + top-8 for pattern p; writes pos/xb output rows."""
        xb = jnp.sqrt(s_re * s_re + s_im * s_im)  # (N, Ft)
        # pad lag axis to 21*256 by wrapping the head (scan_kernel.cuh:85-89)
        pad = xb[: C.SCAN_PAD_LEN - _N, :]
        xbp = jnp.concatenate([xb, pad], axis=0).reshape(_SLICES, _SLICE, ft)
        smax = jnp.max(xbp, axis=1)  # (21, Ft)
        sarg = jnp.argmax(xbp, axis=1).astype(jnp.int32)  # (21, Ft)

        # top-8 slices per freq: repeated max + mask-out
        cur = smax
        for k in range(_NC):
            best = jnp.max(cur, axis=0, keepdims=True)  # (1, Ft)
            bslice = jnp.argmax(cur, axis=0).astype(jnp.int32)  # (Ft,)
            # gather sarg[bslice, f] per lane via mask+reduce (no sublane
            # gather primitive in Pallas TPU)
            hit = lane_iota == bslice[None, :]
            lag_in_slice = jnp.sum(jnp.where(hit, sarg, 0), axis=0)
            pos = (bslice * _SLICE + lag_in_slice) % _N
            pos_out[:, p, k] = pos
            xb_out[:, p, k] = best[0]
            cur = jnp.where(hit, -1.0, cur)

    # prefix patterns 0..min(depth,6)-1
    acc_re, acc_im = term(0)
    select(acc_re, acc_im, 0)
    for p in range(1, min(scan_depth, 6)):
        tre, tim = term(p)
        acc_re = acc_re + tre
        acc_im = acc_im + tim
        select(acc_re, acc_im, p)
    # gap patterns: 6 = frames {0,3}, 7 = frames {0,3,4}
    if scan_depth >= 7:
        t0 = term(0)
        t3 = term(3)
        s_re, s_im = t0[0] + t3[0], t0[1] + t3[1]
        select(s_re, s_im, 6)
        if scan_depth >= 8:
            t4 = term(4)
            select(s_re + t4[0], s_im + t4[1], 7)


def _lag_matrix_np(c: jnp.ndarray) -> jnp.ndarray:
    ext = jnp.concatenate([c, c[: C.SYNC_CORR_LEN - 1]])
    idx = np.arange(_N)[:, None] + np.arange(C.SYNC_CORR_LEN)[None, :]
    return ext[idx]


def _boundary_matrix_np(c: jnp.ndarray) -> jnp.ndarray:
    r = np.arange(C.SYNC_CORR_LEN - 1)[:, None]
    i = np.arange(C.SYNC_CORR_LEN)[None, :]
    wrapped = i >= (C.SYNC_CORR_LEN - 1) - r
    idx = np.where(wrapped, r + i - (C.SYNC_CORR_LEN - 1), 0)
    return jnp.where(jnp.asarray(wrapped), c[idx], 0.0 + 0.0j)


def scan_pallas(c: jnp.ndarray, freqs, scan_depth: int,
                interpret: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Drop-in replacement for ops.scan.scan via the fused Pallas kernel.

    c: (5184,) complex64 window. freqs: tuple or FreqTables. Returns
    (pos, xb) each (F, scan_depth, 8), F unpadded.
    """
    if isinstance(freqs, FreqTables):
        t = freqs
        f_total = t.B.shape[1]
    else:
        t = cached_freq_tables(tuple(float(f) for f in freqs))
        f_total = t.B.shape[1]

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
    E = pad_f(t.E, 1)
    chi = pad_f(t.chi, 1)

    cmat = _lag_matrix_np(c)
    bnd = _boundary_matrix_np(c)

    n_tiles = fp // _F_TILE
    grid = (n_tiles,)

    def tile_spec(rows, blocked=True):
        if blocked:
            return pl.BlockSpec((rows, _F_TILE), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((rows, C.SYNC_CORR_LEN), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        tile_spec(_N, blocked=False),   # cmat re
        tile_spec(_N, blocked=False),   # cmat im
        tile_spec(C.SYNC_CORR_LEN - 1, blocked=False),  # bnd re
        tile_spec(C.SYNC_CORR_LEN - 1, blocked=False),  # bnd im
        tile_spec(C.SYNC_CORR_LEN),     # B re
        tile_spec(C.SYNC_CORR_LEN),     # B im
        tile_spec(_N),                  # E re
        tile_spec(_N),                  # E im
        tile_spec(1),                   # chi re
        tile_spec(1),                   # chi im
    ]
    out_specs = [
        pl.BlockSpec((_F_TILE, scan_depth, _NC), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((_F_TILE, scan_depth, _NC), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((fp, scan_depth, _NC), jnp.int32),
        jax.ShapeDtypeStruct((fp, scan_depth, _NC), jnp.float32),
    ]

    kernel = functools.partial(_scan_kernel, scan_depth)
    pos, xb = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(
        cmat.real, cmat.imag, bnd.real, bnd.imag,
        B.real, B.imag, E.real, E.imag, chi.real, chi.imag,
    )
    return pos[:f_total], xb[:f_total]
