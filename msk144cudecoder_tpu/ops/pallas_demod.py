"""Fused Pallas TPU kernel for per-candidate softbit demodulation.

The jnp demod (ops/softbits.py) gathers a cyclic 864-sample frame per
candidate with take_along_axis; XLA lowers that to scalar-core gathers which
measured ~900 ms/window on the deep scan — the entire pipeline budget.

This kernel fuses THREE stages for each (window, frequency) grid step:
  1. pattern averaging — the (F, P, N) ZA array the jnp path materializes in
     HBM never exists here: a candidate's averaged frame is built in VMEM as
     frame_p(t) = sum_m mask_p[m] * z((pos + t + 864 m) mod N)
     from the doubled mixed signal z_ext = [z | z] (cyclic indexing becomes
     plain slicing; max index pos + 863 + 864*5 < 2N).
  2. frame extraction — Mosaic's dynamic lane ops are restricted (unaligned
     dynamic slices rejected; wide dynamic rotates miscompile on v5e), so
     start = 128 q + r decomposes into a 128-aligned dynamic slice of a
     1024-lane chunk plus a residual rotate r < 128 at a narrow shape.
  3. demod math — identical to softbits.demod and the reference
     (/root/reference/src/softbits_kernel.cuh:9-248): carrier phase from the
     sync template, derotation (commuted through the matched filter:
     sb_q = c_re*(fr_im@WQ) + c_im*(fr_re@WQ) etc.), 144 matched-filter
     softbits via one (R, 864) x (864, 256) MXU matmul pair per frequency
     (R = patterns x 8; the phase sum rides as two extra matrix columns),
     normalization, and nbadsync.

All in-kernel dots use Precision.HIGHEST (parity with the jnp path); all
constant blocks are padded to 128-multiple lane widths; candidate positions
ride VMEM blocks (scalar-prefetch arrays of this size overflow SMEM).
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
_HIGHEST = jax.lax.Precision.HIGHEST

# doubled window: cyclic index pos + 863 + 864*5 < 2N for any pos < N;
# the aligned chunk slice needs floor(max_start/128)*128 + 1024 lanes
_MAX_START = (_N - 1) + 864 * 5
_CHUNK = 1024
_Z_EXT = (_MAX_START // 128) * 128 + _CHUNK  # 10496, a 128 multiple
assert _Z_EXT % 128 == 0 and _Z_EXT >= 2 * _N


@functools.lru_cache(maxsize=None)
def _demod_matrix() -> np.ndarray:
    """(864, 256) = [WQ | WI | sv_re | sv_im | zero pad]."""
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
    P_q/P_i (72, 256): Q/I matmul lanes -> interleaved QIQI... order;
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
    """(8, 256) +-1 at the 16 sync-bit positions of row 0, zero elsewhere."""
    sync_sign = np.zeros((8, 256), dtype=np.float32)
    s8 = C.SYNC_WORD_PM.astype(np.float32)
    for base in (C.FIRST_SYNC_BIT, C.SECOND_SYNC_BIT):
        sync_sign[0, base : base + 8] = s8
    return sync_sign


def _demod_kernel(n_pat: int, f_group: int, prec,
                  c_re, c_im, w_re, w_im, pos_ref, m_ref, pq_ref, pi_ref,
                  dsel_ref, ssign_ref, sb_out, nbad_out,
                  z_re, z_im, acc_re, acc_im):
    # mix the window down by this step's 8 carrier rows entirely in VMEM:
    # z = c * W with W = exp(-2j pi f t / fs) (softbits.mix_all semantics);
    # the (F, 2N) mixed field never touches HBM
    cr = c_re[0:1, :]
    ci = c_im[0:1, :]
    z_re[:, :] = cr * w_re[:, :] - ci * w_im[:, :]
    z_im[:, :] = cr * w_im[:, :] + ci * w_re[:, :]

    def chunk(ref, fi, start):
        """(1, 864) slice [start : start+864] of freq fi's averaged row."""
        q128 = pl.multiple_of((start // 128) * 128, 128)
        r = start - q128
        piece = ref[fi : fi + 1, pl.ds(q128, _CHUNK)]
        return pltpu.roll(piece, -r, 1)[:, :_FRAME]

    # Pattern-averaged rows accumulate in VMEM (softbits.pattern_average
    # semantics): static full-width rolls at full vreg utilization, prefix
    # reuse for patterns 0..5; each candidate then needs only ONE chunk
    # extraction instead of |mask| of them. The roll never wraps garbage
    # into readable lanes: u + 864 m <= 10367 < _Z_EXT for u <= N+863.
    rows_re = [[None] * (n_pat * _NC) for _ in range(f_group)]
    rows_im = [[None] * (n_pat * _NC) for _ in range(f_group)]

    def extract(p):
        for fi in range(f_group):
            for k in range(_NC):
                start = pos_ref[fi, p * _NC + k]
                rows_re[fi][p * _NC + k] = chunk(acc_re, fi, start)
                rows_im[fi][p * _NC + k] = chunk(acc_im, fi, start)

    acc_re[:, :] = z_re[:, :]
    acc_im[:, :] = z_im[:, :]
    extract(0)
    for p in range(1, min(n_pat, 6)):
        acc_re[:, :] = acc_re[:, :] + pltpu.roll(z_re[:, :], _Z_EXT - 864 * p, 1)
        acc_im[:, :] = acc_im[:, :] + pltpu.roll(z_im[:, :], _Z_EXT - 864 * p, 1)
        extract(p)
    if n_pat >= 7:  # gap pattern 6: frames {0, 3}
        acc_re[:, :] = z_re[:, :] + pltpu.roll(z_re[:, :], _Z_EXT - 864 * 3, 1)
        acc_im[:, :] = z_im[:, :] + pltpu.roll(z_im[:, :], _Z_EXT - 864 * 3, 1)
        extract(6)
        if n_pat >= 8:  # gap pattern 7: frames {0, 3, 4}
            acc_re[:, :] = acc_re[:, :] + pltpu.roll(z_re[:, :], _Z_EXT - 864 * 4, 1)
            acc_im[:, :] = acc_im[:, :] + pltpu.roll(z_im[:, :], _Z_EXT - 864 * 4, 1)
            extract(7)

    fr_re = jnp.concatenate([r for fr in rows_re for r in fr], axis=0)
    fr_im = jnp.concatenate([r for fr in rows_im for r in fr], axis=0)

    M = m_ref[:]  # (864, 256) padded
    A = jnp.dot(fr_re, M, preferred_element_type=jnp.float32, precision=prec)
    Bm = jnp.dot(fr_im, M, preferred_element_type=jnp.float32, precision=prec)

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
                     precision=prec)
             + jnp.dot(sb_i, pi_ref[:], preferred_element_type=jnp.float32,
                       precision=prec))[:, :144]

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
                            precision=prec)
    sb_out[:, :] = sb128  # (f_group*R, 128)
    nbad_out[:, :] = jnp.broadcast_to(
        nbad, (f_group * n_pat * _NC, 128)).astype(jnp.int32)


@functools.lru_cache(maxsize=None)
def _w2_tables(freqs_key: tuple) -> tuple[np.ndarray, np.ndarray]:
    """Doubled mix table (Fp, _Z_EXT) re/im: W2[f, t] = exp(-2j pi f (t mod N)
    / fs) for t < 2N, zero-padded — a jit constant, built once per config."""
    freqs = np.asarray(freqs_key, dtype=np.float64)
    FG = 8
    Fp = len(freqs) + (-len(freqs) % FG)
    t = np.arange(_N)
    phase = np.mod(np.outer(freqs, t) / C.SAMPLE_RATE, 1.0)
    W = np.exp(-2j * np.pi * phase)
    W2 = np.zeros((Fp, _Z_EXT), dtype=np.complex64)
    W2[: len(freqs), :_N] = W
    W2[: len(freqs), _N : 2 * _N] = W
    return np.ascontiguousarray(W2.real.astype(np.float32)), \
        np.ascontiguousarray(W2.imag.astype(np.float32))


def demod_pallas(c: jnp.ndarray, freqs, pos: jnp.ndarray,
                 interpret: bool | None = None,
                 fast_math: bool = False) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Single-window demod of all candidates (vmap-batchable).

    c: (N,) complex64 analytic window (the per-frequency mix-down happens
       in-kernel against the constant carrier table — softbits.mix_all and
       pattern_average semantics without either array touching HBM).
    freqs: static tuple of search frequencies (or tables.FreqTables, from
       which only the frequency count/grid is used via its W table).
    pos: (F, P, 8) int32 candidate positions in [0, N).
    Returns (softbits (F, P, 8, 128) f32, nbadsync (F, P, 8) i32).
    interpret=None: auto (interpreter off TPU, compiled on TPU).
    """
    from .tables import FreqTables

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    _, Pn, _ = pos.shape
    F = pos.shape[0]
    R = Pn * _NC
    FG = 8  # frequencies per grid step (sublane-aligned blocks, fat matmuls)
    f_pad = -F % FG
    Fp = F + f_pad

    if isinstance(freqs, FreqTables):
        # sharded path: W arrives as a traced array; double it in-graph
        W = freqs.W
        W2 = jnp.concatenate(
            [W, W, jnp.zeros((F, _Z_EXT - 2 * _N), W.dtype)], axis=-1)
        if f_pad:
            W2 = jnp.concatenate(
                [W2, jnp.zeros((f_pad, _Z_EXT), W.dtype)], axis=0)
        w_re, w_im = W2.real, W2.imag
    else:
        w_re, w_im = (jnp.asarray(a) for a in
                      _w2_tables(tuple(float(f) for f in freqs)))

    # the window, doubled, replicated into an 8-sublane block
    c_ext = jnp.concatenate([c, c, jnp.zeros((_Z_EXT - 2 * _N,), c.dtype)])
    c_re = jnp.broadcast_to(c_ext.real[None, :], (8, _Z_EXT))
    c_im = jnp.broadcast_to(c_ext.imag[None, :], (8, _Z_EXT))

    # positions ride VMEM, row f = freq f's R starts (a scalar-prefetch
    # array this size overflows SMEM)
    pos_vmem = jnp.zeros((Fp, 128), jnp.int32)
    pos_vmem = pos_vmem.at[:F, :R].set(pos.reshape(F, R))

    M = _demod_matrix()
    P_q, P_i, DSEL = _sb_maps()

    prec = (jax.lax.Precision.DEFAULT if fast_math
            else jax.lax.Precision.HIGHEST)
    kernel = functools.partial(_demod_kernel, Pn, FG, prec)
    const = lambda r, cc: pl.BlockSpec((r, cc), lambda f: (0, 0),
                                       memory_space=pltpu.VMEM)
    sb, nbad128 = pl.pallas_call(
        kernel,
        grid=(Fp // FG,),
        in_specs=[
            const(8, _Z_EXT),  # c re (replicated)
            const(8, _Z_EXT),  # c im
            pl.BlockSpec((FG, _Z_EXT), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FG, _Z_EXT), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FG, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
            const(_FRAME, 256),
            const(72, 256),
            const(72, 256),
            const(144, 128),
            const(8, 256),
        ],
        out_specs=[
            pl.BlockSpec((FG * R, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((FG * R, 128), lambda f: (f, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Fp * R, 128), jnp.float32),
            jax.ShapeDtypeStruct((Fp * R, 128), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((FG, _Z_EXT), jnp.float32),  # mixed rows z re
            pltpu.VMEM((FG, _Z_EXT), jnp.float32),  # mixed rows z im
            pltpu.VMEM((FG, _Z_EXT), jnp.float32),  # pattern-averaged re
            pltpu.VMEM((FG, _Z_EXT), jnp.float32),  # pattern-averaged im
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(
        c_re, c_im, w_re, w_im, pos_vmem, M, P_q, P_i, DSEL, _sync_sign(),
    )
    sb = sb.reshape(Fp, Pn, _NC, 128)[:F]
    nbad = nbad128[:, 0].reshape(Fp, Pn, _NC)[:F]
    return sb, nbad
