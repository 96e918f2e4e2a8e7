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


def select_survivors(nbad_f: jnp.ndarray, xb_f: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k candidate indices in EXACT lexicographic (nbadsync asc, xb desc)
    order, via a two-key sort. xb >= 0 (a magnitude), so its int32 bitcast is
    order-isomorphic; a float composite key would quantize the xb tie-break
    away (f32 ulp at 1e9 is 64). The reference BP-decodes every
    under-threshold survivor (index_kernel.cuh:22-75); with a static K this
    ordering decides truncation, so it must be exact."""
    nc = nbad_f.shape[0]
    xb_bits = jax.lax.bitcast_convert_type(jnp.maximum(xb_f, 0.0), jnp.int32)
    _, _, sorted_idx = jax.lax.sort(
        (nbad_f.astype(jnp.int32), -xb_bits, jnp.arange(nc, dtype=jnp.int32)),
        num_keys=2)
    return sorted_idx[:k]


_PREFILTER_BLK = 128  # survivor-demod kernel block (pallas_survivor.sb_blk)


def resolve_prefilter(cfg: DecoderConfig, nc: int, use_pallas: bool) -> int:
    """Effective xb-prefilter size: 0 = full demod. Auto (None) enables it
    on the Pallas path at 2x max_survivors (measured on v5e: 1.02 ms/win vs
    1.37 at 4x and 1.85 full — tools/_surv_probe.py); any explicit value is
    rounded up to the kernel block and disabled when it would not shrink the
    work."""
    p = cfg.survivor_prefilter
    if p is None:
        p = 2 * cfg.max_survivors if use_pallas else 0
    if p <= 0:
        return 0
    p = -(-p // _PREFILTER_BLK) * _PREFILTER_BLK
    return 0 if p >= nc else p


# select_survivors_topk exactness domain: xb clamped into [2^-4, 2^20).
_XB_LO = 2.0 ** -4
_XB_HI = float(np.float32(2.0 ** 20) * (1.0 - 2.0 ** -24))
# fast path needs (threshold + 2) * 24 exponent doublings below 2^-4 to stay
# in normal f32 range (TPU flushes subnormals): threshold <= 4.
TOPK_MAX_THRESHOLD = 4


def select_survivors_topk(nbad_f: jnp.ndarray, xb_f: jnp.ndarray, k: int,
                          threshold: int) -> jnp.ndarray:
    """Fast exact survivor selection via one f32 top_k (~9x cheaper than the
    full 24k-candidate sort on v5e).

    Key = clamp(xb, 2^-4, 2^20) * 2^(-24 * min(nbad, threshold+1)): the
    exponent shift is exact (power-of-two multiply, no underflow for
    threshold <= 4), so ordering within each nbadsync class is the exact f32
    xb order, and classes cannot interleave (24 doublings cover the clamp
    range, and the 2^20*(1-2^-24) ceiling keeps the boundary strict). Two
    deviations from select_survivors, neither visible in decode output:
      - candidates below the survivor threshold all land in one bucket, so
        DIAGNOSTICS rows (never BP-decoded, never printed by the reference —
        main.cu:480-525 reads only is_message_present items) order by xb
        without the nbadsync tie-break;
      - xb outside [2^-4, 2^20) saturates and ties within its class (xb is
        the magnitude of a >=504-sample unit-RMS correlation; values beyond
        that range do not occur in RMS-normalized input).
    """
    cls = jnp.minimum(nbad_f, threshold + 1).astype(jnp.int32)
    # 2^(-24*cls) built from exponent bits: exact power of two
    mul = jax.lax.bitcast_convert_type(
        ((127 - 24 * cls) << 23).astype(jnp.int32), jnp.float32)
    key = jnp.clip(xb_f, _XB_LO, _XB_HI) * mul
    _, idx = jax.lax.top_k(key, k)
    return idx


def decode_window_tables(c: jnp.ndarray, freqs, cfg: DecoderConfig,
                         chan_valid: jnp.ndarray | None = None) -> WindowDecodeResult:
    """One analytic window (5184,) complex64 -> fixed-shape decode results.

    `freqs` is either a static tuple (single-device: tables become jit
    constants) or a tables.FreqTables of arrays (shard_map: each device gets
    its frequency-axis slice). All shapes derive from the table arrays so the
    same code serves both paths.

    `chan_valid` (F,) bool optionally masks frequency channels out of survivor
    selection (sharding pads the grid past the configured right boundary to
    make F divisible by the mesh; those channels must not compete for
    survivor slots or report f0 outside the requested search width).
    """
    use_pallas = cfg.use_pallas
    if use_pallas is None:
        # auto: fused kernels on TPU (validated on v5e hardware — exact
        # demod parity, scan candidate-set parity; ~250x faster than XLA's
        # scalar-core gather lowering); pure-jnp elsewhere
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        # Fused TPU kernel: scan never materializes the (P, N, F) metric
        # field.
        from . import pallas_scan

        pos, xb = pallas_scan.scan_pallas(c, freqs, cfg.scan_depth,
                                          fast_math=cfg.fast_math,
                                          num_cand=cfg.candidates_per_pattern)
    else:
        pos, xb = scan.scan(c, freqs, cfg.scan_depth,
                            num_cand=cfg.candidates_per_pattern)  # (F, P, k)

    nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
    pre = resolve_prefilter(cfg, nc, use_pallas)

    if pre:
        # xb-prefilter: demodulate only the top `pre` candidates by scan xb
        # (see ops/pallas_survivor.py). Masked channels rank last and get
        # nbadsync 17 after demod, as on the full path.
        from . import pallas_survivor

        xb_m = xb if chan_valid is None else jnp.where(
            chan_valid[:, None, None], xb, 0.0)
        xb_sel, pre_idx = jax.lax.top_k(xb_m.reshape(nc), pre)
        per_f = pos.shape[1] * pos.shape[2]
        f_idx = pre_idx // per_f
        p_idx = (pre_idx % per_f) // pos.shape[2]
        pos_f = pos.reshape(nc)[pre_idx]
        if use_pallas:
            sb_f, nbad_f = pallas_survivor.demod_survivors(
                c, freqs, pos_f, f_idx, p_idx, fast_math=cfg.fast_math)
        else:
            sb_f, nbad_f = pallas_survivor.demod_survivors_ref(
                c, freqs, pos_f, f_idx, p_idx)
        if chan_valid is not None:
            nbad_f = jnp.where(chan_valid[f_idx], nbad_f, 17)
        xb_f = xb_sel
        idx_map = pre_idx  # local survivor index -> flat candidate index
        nc_sel = pre
    else:
        if use_pallas:
            # mix-down AND pattern averaging both happen inside the demod
            # kernel; neither field ever touches HBM
            from . import pallas_demod

            sb, nbad = pallas_demod.demod_pallas(c, freqs, pos,
                                                 fast_math=cfg.fast_math)
        else:
            sb, nbad = softbits.demod_candidates(c, freqs, cfg.scan_depth, pos)

        if chan_valid is not None:
            # masked channels: nbadsync above any threshold, xb zeroed — they
            # can neither become survivors nor outrank real diagnostics rows
            nbad = jnp.where(chan_valid[:, None, None], nbad, 17)
            xb = jnp.where(chan_valid[:, None, None], xb, 0.0)
        xb_f = xb.reshape(nc)
        nbad_f = nbad.reshape(nc)
        pos_f = pos.reshape(nc)
        sb_f = sb.reshape(nc, 128)
        idx_map = None
        nc_sel = nc

    k = min(cfg.max_survivors, nc_sel)
    if cfg.nbadsync_threshold <= TOPK_MAX_THRESHOLD:
        top_idx = select_survivors_topk(nbad_f, xb_f, k, cfg.nbadsync_threshold)
    else:
        top_idx = select_survivors(nbad_f, xb_f, k)
    nbad_k = nbad_f[top_idx]
    valid = nbad_k <= cfg.nbadsync_threshold
    llr = sb_f[top_idx]

    # BP stays on the jnp path even when use_pallas: measured on v5e, the
    # fused Pallas BP (ops/pallas_ldpc.py) runs 0.181 ms/win vs 0.127 for
    # XLA's batched lowering of the same math (vmap batches the B windows'
    # (K, 384)x(384, 418) matmuls into large ones; a per-window kernel
    # serializes them). tools/_tail_probe.py reproduces the bake-off.
    bp = ldpc.bp_decode(llr, valid)

    # Device-side result compaction: keep only max_results slots, decodes
    # first (then best remaining survivors for diagnostics). The reference
    # copies its whole result table to the host every loop
    # (result_keeper.cuh:123-130); we ship ~R rows instead of K.
    # top_idx is already in exact (nbadsync, xb) order, so rank position =
    # arange(k); the two-key sort puts decodes first, best-ordered within.
    r = min(cfg.max_results, k)
    _, sel = jax.lax.sort(
        ((~bp.found).astype(jnp.int32), jnp.arange(k, dtype=jnp.int32)),
        num_keys=2)
    sel = sel[:r]
    cand_flat = idx_map[top_idx] if idx_map is not None else top_idx
    return WindowDecodeResult(
        cand_index=cand_flat[sel],
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
    per_f = cfg.scan_depth * cfg.candidates_per_pattern
    fi, rem = divmod(int(flat_idx), per_f)
    pi, cn = divmod(rem, cfg.candidates_per_pattern)
    return fi, pi, cn
