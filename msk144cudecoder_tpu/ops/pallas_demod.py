"""Fused Pallas TPU kernel for per-candidate softbit demodulation.

The jnp demod (ops/softbits.py) gathers a cyclic 864-sample frame per
candidate with take_along_axis; XLA lowers that to scalar-core gathers which
measured ~900 ms/window on the deep scan — the entire pipeline budget. Here
each frame is extracted with a dynamic lane-roll (vector shift; Mosaic
forbids unaligned dynamic lane slices but supports dynamic rotates), and
everything downstream of the extraction is one MXU matmul pair per
(frequency) grid step covering all patterns x 8 candidates.

Per candidate the math is identical to softbits.demod (and the reference
/root/reference/src/softbits_kernel.cuh:9-248):

  s      = sum_t frame(t) * sv(t)                carrier phase estimate
           (sv = conj(cb42) on both sync regions)
  d      = frame * conj(s)/|s|                   derotation
  sb_q   = imag(d) @ WQ ; sb_i = real(d) @ WI    144 matched-filter softbits
  scale  = 2 / (sigma(sb) * 0.6^2)               normalization
  nbad   = hard sync-bit mismatches

Derotation is linear, so it commutes with the matched filter:
  sb_q = c_re*(fr_im @ WQ) + c_im*(fr_re @ WQ)
  sb_i = c_re*(fr_re @ WI) - c_im*(fr_im @ WI)
and s itself is two extra columns (sv_re, sv_im) of the same matmul: one
(R, 864) x (864, 148) matmul pair per frequency, R = patterns x 8.
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

_N = C.WINDOW_LEN
_NC = C.NUM_CANDIDATES_PER_PATTERN  # 8
_FRAME = C.FRAME_LEN  # 864
_EXT = _N + _FRAME - 1  # za columns incl. cyclic halo (6047)
# Lane pad to a 128 multiple; max aligned chunk start (5120) + chunk (1024)
# lands exactly at 6144, so any start < N reads only valid halo data.
_EXT_PAD = -(-_EXT // 128) * 128  # 6144
_CHUNK = 1024  # aligned slice width: 864 frame + up to 127 residual + pad


@functools.lru_cache(maxsize=None)
def _demod_matrix() -> np.ndarray:
    """(864, 256) = [WQ | WI | sv_re | sv_im | zero pad]. All constant blocks
    are padded to 128-multiple lane widths — odd-width VMEM block DMAs hit
    unimplemented runtime paths on v5e."""
    WQ, WI = _matched_filter_mats()
    sv = _sync_vec()
    M = np.zeros((_FRAME, 256), dtype=np.float32)
    M[:, 0:72] = WQ
    M[:, 72:144] = WI
    M[:, 144] = sv.real
    M[:, 145] = sv.imag
    return M


@functools.lru_cache(maxsize=None)
def _sb_maps() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One-hot layout matrices (no in-kernel gathers):
    P_q/P_i (72, 144): Q/I matmul lanes -> interleaved QIQI... order;
    DSEL (144, 128): interleaved softbits -> the 128 data softbits."""
    P_q = np.zeros((72, 256), dtype=np.float32)
    P_i = np.zeros((72, 256), dtype=np.float32)
    for q in range(72):
        P_q[q, 2 * q] = 1.0
        P_i[q, 2 * q + 1] = 1.0
    DSEL = np.zeros((144, 128), dtype=np.float32)
    for j, t in enumerate(list(range(8, 56)) + list(range(64, 144))):
        DSEL[t, j] = 1.0
    return P_q, P_i, DSEL


@functools.lru_cache(maxsize=None)
def _sync_sign() -> np.ndarray:
    """(8, 256) +-1 at the 16 sync-bit positions of row 0's first 144 lanes
    (shape padded to full tiles for the VMEM block DMA)."""
    sync_sign = np.zeros((8, 256), dtype=np.float32)
    s8 = C.SYNC_WORD_PM.astype(np.float32)
    for base in (C.FIRST_SYNC_BIT, C.SECOND_SYNC_BIT):
        sync_sign[0, base : base + 8] = s8
    return sync_sign


def _demod_kernel(n_pat: int,
                  za_re, za_im, pos_ref, m_ref, pq_ref, pi_ref, dsel_ref,
                  ssign_ref, sb_out, nbad_out):
    # Frame extraction: Mosaic's dynamic lane ops are restricted — unaligned
    # dynamic slices are rejected and wide (>~1k lane) dynamic rotates
    # miscompile (verified on v5e). Decompose start = 128q + r: an aligned
    # dynamic slice to a 1024-lane chunk (q128 + 1024 <= EXT_PAD for any
    # start < N), then a residual rotate r < 128 at a narrow, verified shape.
    rows_re = []
    rows_im = []
    for p in range(n_pat):
        for k in range(_NC):
            start = pos_ref[0, p * _NC + k]
            q128 = pl.multiple_of((start // 128) * 128, 128)
            r = start - q128
            chunk_re = za_re[p : p + 1, pl.ds(q128, _CHUNK)]  # (1, 1024)
            chunk_im = za_im[p : p + 1, pl.ds(q128, _CHUNK)]
            rows_re.append(pltpu.roll(chunk_re, -r, 1)[:, :_FRAME])
            rows_im.append(pltpu.roll(chunk_im, -r, 1)[:, :_FRAME])
    import os
    _stage = int(os.environ.get("MSK144_DEMOD_STAGE", "9"))  # debug bisect

    fr_re = jnp.concatenate(rows_re, axis=0)  # (R, 864), R = n_pat*8
    fr_im = jnp.concatenate(rows_im, axis=0)

    if _stage <= 1:
        sb_out[:, :] = fr_re[:, :128]
        nbad_out[:, :] = fr_im[:, :128].astype(jnp.int32)
        return

    M = m_ref[:]  # (864, 256) padded
    A = jnp.dot(fr_re, M, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)  # (R, 256)
    Bm = jnp.dot(fr_im, M, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

    if _stage <= 2:
        sb_out[:, :] = A[:, :128]
        nbad_out[:, :] = Bm[:, :128].astype(jnp.int32)
        return

    # phase: s = sum fr * sv (sv already holds the conjugated template)
    s_re = A[:, 144:145] - Bm[:, 145:146]  # (R, 1)
    s_im = Bm[:, 144:145] + A[:, 145:146]
    mag = jnp.sqrt(s_re * s_re + s_im * s_im)
    inv = 1.0 / jnp.maximum(mag, 1e-30)
    c_re = s_re * inv          # cfac = conj(s)/|s|
    c_im = -s_im * inv

    # derotated matched-filter outputs (72 Q | 72 I) -> interleaved 144
    sb_q = c_re * Bm[:, 0:72] + c_im * A[:, 0:72]
    sb_i = c_re * A[:, 72:144] - c_im * Bm[:, 72:144]
    sb144 = (jnp.dot(sb_q, pq_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
             + jnp.dot(sb_i, pi_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST))[:, :144]

    if _stage <= 3:
        sb_out[:, :] = sb144[:, :128]
        nbad_out[:, :] = sb144[:, 16:144].astype(jnp.int32)
        return

    # normalization (softbits_kernel.cuh:186-201)
    sav = jnp.mean(sb144, axis=-1, keepdims=True)
    s2av = jnp.mean(sb144 * sb144, axis=-1, keepdims=True)
    ssig = jnp.sqrt(jnp.maximum(s2av - sav * sav, 1e-30))
    scale = 2.0 / (ssig * (C.SOFTBIT_SIGMA ** 2))

    # nbadsync = (16 - sum hard*sync_sign)/2 == per-word (8-v)/2 summed
    ssign = ssign_ref[0:1, :144]  # (1, 144)
    hard = jnp.where(sb144 < 0.0, -1.0, 1.0)
    agree = jnp.sum(jnp.where(ssign != 0.0, hard * ssign, 0.0), axis=-1,
                    keepdims=True)
    nbad = (16.0 - agree) * 0.5  # (R, 1)

    sb128 = scale * jnp.dot(sb144, dsel_ref[:], preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    sb_out[:, :] = sb128  # (R, 128)
    nbad_out[:, :] = jnp.broadcast_to(nbad, (n_pat * _NC, 128)).astype(jnp.int32)


def demod_pallas(za: jnp.ndarray, pos: jnp.ndarray,
                 interpret: bool | None = None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-window demod of all candidates (vmap-batchable).

    za: (F, P, N) complex64 pattern-averaged mixed signal
    pos: (F, P, 8) int32 candidate positions in [0, N)
    Returns (softbits (F, P, 8, 128) f32, nbadsync (F, P, 8) i32).
    interpret=None: auto (interpreter off TPU, compiled on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    F, Pn, _ = za.shape
    R = Pn * _NC
    za_ext = jnp.concatenate(
        [za, za[..., : _FRAME - 1],
         jnp.zeros(za.shape[:-1] + (_EXT_PAD - _EXT,), za.dtype)], axis=-1)
    # strictly 2D layouts in-kernel (conservative Mosaic surface); the
    # pattern axis pads to 8 rows so sublane blocks are 8-divisible
    pp = 8
    pad_rows = pp - Pn
    if pad_rows:
        za_ext = jnp.concatenate(
            [za_ext, jnp.zeros((F, pad_rows, _EXT_PAD), za_ext.dtype)], axis=1)
    za2_re = za_ext.real.reshape(F * pp, _EXT_PAD)
    za2_im = za_ext.imag.reshape(F * pp, _EXT_PAD)
    # positions ride VMEM, one (8, 128) block per frequency with the 48
    # starts in row 0 (a 24k-entry scalar-prefetch array overflows SMEM)
    pos_vmem = jnp.zeros((F, pp, 128), jnp.int32)
    pos_vmem = pos_vmem.at[:, 0, :R].set(pos.reshape(F, R))
    pos_vmem = pos_vmem.reshape(F * pp, 128)

    grid = (F,)
    M = _demod_matrix()
    P_q, P_i, DSEL = _sb_maps()

    kernel = functools.partial(_demod_kernel, Pn)
    const = lambda r, c: pl.BlockSpec((r, c), lambda f, *_: (0, 0),
                                      memory_space=pltpu.VMEM)
    sb, nbad128 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((pp, _EXT_PAD), lambda f: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp, _EXT_PAD), lambda f: (f, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pp, 128), lambda f: (f, 0),
                         memory_space=pltpu.VMEM),
            const(_FRAME, 256),
            const(72, 256),
            const(72, 256),
            const(144, 128),
            const(8, 256),
        ],
        out_specs=[
            pl.BlockSpec((R, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((F * R, 128), jnp.float32),
            jax.ShapeDtypeStruct((F * R, 128), jnp.int32),
        ],
        interpret=interpret,
    )(
        za2_re, za2_im, pos_vmem, M, P_q, P_i, DSEL, _sync_sign(),
    )
    sb = sb.reshape(F, Pn, _NC, 128)
    nbad = nbad128[:, 0].reshape(F, Pn, _NC)
    return sb, nbad
