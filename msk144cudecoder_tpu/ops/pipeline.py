"""End-to-end jitted decode pipeline for one (or a batch of) 5184-sample
windows: preprocessing -> scan -> demod -> survivor selection -> LDPC -> CRC.

This is the TPU counterpart of the reference's do_decode driver
(/root/reference/src/main.cu:428-532) plus its four kernel launches, fused
under one jax.jit with static shapes throughout. The reference's dynamic
survivor compaction (index_kernel) becomes a top-K selection keyed on
(nbadsync ascending, xb descending); K = cfg.max_survivors.

Everything device-side returns fixed-shape arrays; message-text unpacking and
dedup happen host-side (runtime/), as in the reference (L6 layer).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C
from ..config import DecoderConfig
from . import analytic, ldpc, scan, softbits

_N = C.WINDOW_LEN


class WindowDecodeResult(NamedTuple):
    """Fixed-shape per-window outputs; K = cfg.max_survivors survivors."""

    cand_index: jnp.ndarray  # (K,) int32 flat index into (F, P, 8)
    valid: jnp.ndarray  # (K,) bool: nbadsync <= threshold
    found: jnp.ndarray  # (K,) bool: LDPC+CRC success
    message_bits: jnp.ndarray  # (K, 77) int8
    nbadsync: jnp.ndarray  # (K,) int32
    xb: jnp.ndarray  # (K,) float32
    pos: jnp.ndarray  # (K,) int32
    ldpc_iterations: jnp.ndarray  # (K,) int32
    hard_errors: jnp.ndarray  # (K,) int32
    num_survivors: jnp.ndarray  # () int32: how many passed the threshold
    block_power: jnp.ndarray  # (8,) float32 sub-block powers for SNR tracking


def preprocess(raw: jnp.ndarray, cfg: DecoderConfig) -> jnp.ndarray:
    """Raw input window -> analytic complex64 window (..., 5184).

    read_mode 1: raw is (..., 5184) int16/float audio, RMS-normalized then
    converted (main.cu:301-332). read_mode 2: raw is (..., 10368) interleaved
    int8 IQ, scaled by 1/128 then low-pass filtered (main.cu:334-381; the
    reference applies no RMS normalization in IQ mode).
    """
    if cfg.read_mode == 1:
        x = analytic.rms_normalize(raw)
        if cfg.analytic_method == 1:
            return analytic.analytic_method1(x)
        return analytic.analytic_method2(x)
    z = raw.astype(jnp.float32) / 128.0
    zc = jax.lax.complex(z[..., 0::2], z[..., 1::2])
    return analytic.iq_filter(zc)


def block_powers(c: jnp.ndarray) -> jnp.ndarray:
    """(8,) sub-block signal powers of one analytic window, matching the SNR
    tracker's host loop (/root/reference/src/snr_tracker.cu:21-33)."""
    return jnp.sum(jnp.abs(c.reshape(8, _N // 8)) ** 2, axis=-1).astype(jnp.float32)


def decode_window_tables(c: jnp.ndarray, freqs, cfg: DecoderConfig) -> WindowDecodeResult:
    """One analytic window (5184,) complex64 -> fixed-shape decode results.

    `freqs` is either a static tuple (single-device: tables become jit
    constants) or a tables.FreqTables of arrays (shard_map: each device gets
    its frequency-axis slice). All shapes derive from the table arrays so the
    same code serves both paths.
    """
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        # auto: fused kernels on TPU (validated on v5e hardware — exact
        # demod parity, scan candidate-set parity; ~250x faster than XLA's
        # scalar-core gather lowering); pure-jnp elsewhere
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # Fused TPU kernels: scan never materializes the (P, N, F) metric
        # field; demod extracts frames with vector rolls instead of gathers.
        from . import pallas_demod, pallas_scan

        pos, xb = pallas_scan.scan_pallas(c, freqs, cfg.scan_depth,
                                          fast_math=cfg.fast_math)
        # mix-down AND pattern averaging both happen inside the demod
        # kernel; neither field ever touches HBM
        sb, nbad = pallas_demod.demod_pallas(c, freqs, pos,
                                             fast_math=cfg.fast_math)
    else:
        pos, xb = scan.scan(c, freqs, cfg.scan_depth)  # (F, P, 8) each
        sb, nbad = softbits.demod_candidates(c, freqs, cfg.scan_depth, pos)

    nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
    k = min(cfg.max_survivors, nc)
    xb_f = xb.reshape(nc)
    nbad_f = nbad.reshape(nc)
    pos_f = pos.reshape(nc)
    sb_f = sb.reshape(nc, 128)

    # Survivor ranking: primary nbadsync ascending, secondary xb descending.
    key = -nbad_f.astype(jnp.float32) * 1e9 + jnp.minimum(xb_f, 1e8)
    _, top_idx = jax.lax.top_k(key, k)
    top_idx = top_idx.astype(jnp.int32)
    nbad_k = nbad_f[top_idx]
    valid = nbad_k <= cfg.nbadsync_threshold
    llr = sb_f[top_idx]

    bp = ldpc.bp_decode(llr, valid)

    # Device-side result compaction: keep only max_results slots, decodes
    # first (then best remaining survivors for diagnostics). The reference
    # copies its whole result table to the host every loop
    # (result_keeper.cuh:123-130); we ship ~R rows instead of K.
    r = min(cfg.max_results, k)
    rank = bp.found.astype(jnp.float32) * 1e12 + key[top_idx]
    _, sel = jax.lax.top_k(rank, r)
    return WindowDecodeResult(
        cand_index=top_idx[sel],
        valid=valid[sel],
        found=bp.found[sel],
        message_bits=bp.codeword[sel, :77],
        nbadsync=nbad_k[sel],
        xb=xb_f[top_idx][sel],
        pos=pos_f[top_idx][sel],
        ldpc_iterations=bp.iterations[sel],
        hard_errors=bp.hard_errors[sel],
        num_survivors=(nbad_f <= cfg.nbadsync_threshold).sum().astype(jnp.int32),
        block_power=block_powers(c),
    )


def decode_window(c: jnp.ndarray, cfg: DecoderConfig) -> WindowDecodeResult:
    """Single-device decode: frequency tables are jit-constants from cfg."""
    return decode_window_tables(c, tuple(float(f) for f in cfg.freqs), cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def decode_raw(raw: jnp.ndarray, cfg: DecoderConfig) -> WindowDecodeResult:
    """Jitted: batch of raw windows (B, raw_len) -> batched results."""
    c = preprocess(raw, cfg)
    return jax.vmap(lambda w: decode_window(w, cfg))(c)


def raw_window_len(cfg: DecoderConfig) -> int:
    return _N * 2 if cfg.read_mode == 2 else _N


def unpack_candidate_index(cfg: DecoderConfig, flat_idx: int) -> tuple[int, int, int]:
    """Flat candidate index -> (freq_idx, pattern_idx, candidate_num)."""
    per_f = cfg.scan_depth * C.NUM_CANDIDATES_PER_PATTERN
    fi, rem = divmod(int(flat_idx), per_f)
    pi, cn = divmod(rem, C.NUM_CANDIDATES_PER_PATTERN)
    return fi, pi, cn
