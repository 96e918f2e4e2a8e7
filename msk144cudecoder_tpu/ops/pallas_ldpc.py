"""Fused Pallas TPU kernel for the batched LDPC(128,90) BP decode.

The jnp BP (ops/ldpc.py) is algorithmically right for TPU — one-hot-matmul
edge selection, 128-bit codewords on lanes, candidates on sublanes — but XLA
materializes every (K, 418)/(K, 384) intermediate to HBM between the ~8 ops
of each of the 10 iterations (~100 MB of HBM traffic per window at K=512).
This kernel runs the whole loop in VMEM: HBM sees only the (K, 128) LLR
input and three small outputs.

Same math as ops/ldpc.py (reference: /root/reference/src/ldpc_kernel.cuh:
100-248 — zn/cw/parity/CRC gate per iteration, platanh check->bit updates,
per-candidate result freezing as the early-exit analog):

  - one-hot selection matmuls run as explicit 3x-bf16 splits (exact: the
    split is a 3x8-bit mantissa decomposition and each output column copies
    exactly one f32 input), matching Precision.HIGH in the jnp path;
  - parity row sums and the CRC GF(2) mat-vec run as single-pass bf16 dots,
    which are EXACT here: both operands are 0/1 (exactly representable) and
    row sums are <= 90 (exact in the f32 accumulator);
  - leave-one-out check products run in the log domain (mirroring
    ops.ldpc._loo_log_domain op for op on a 512-lane padded edge axis;
    padded SEL columns are zero so garbage in lanes >= 418 never
    propagates).

Edge tables ride in VMEM as bf16 one-hot matrices (halved footprint, no
per-iteration split needed on the constant side).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import constants as C
from ..protocol import ldpc_tables as T
from .ldpc import _LOG_FLOOR, BPResult, _tables, platanh

_NE = T.N_CHECKS * T.MAX_ROW_DEGREE  # 418
_EPAD = 512  # edge axis padded to full lane tiles
_CRC_LANE = 64  # lane offset of the CRC columns in the fused parity matrix


@functools.lru_cache(maxsize=None)
def _kernel_tables() -> dict:
    """ops/ldpc tables padded to lane-tile shapes, one-hots as bf16."""
    t = _tables()
    sel_bit = np.zeros((128, _EPAD), np.float32)
    sel_bit[:, :_NE] = t["SEL_BIT"]
    sel_sum = np.zeros((_EPAD, 128), np.float32)
    sel_sum[:_NE, :] = t["SEL_SUM"]
    grp = np.zeros((_EPAD, 128), np.float32)
    grp[:_NE, :] = t["GRP"]
    back = np.zeros((128, _EPAD), np.float32)
    back[:, :_NE] = t["BACK"]
    # parity + CRC as ONE matmul: lanes [0,38) count each check row's set
    # bits, lanes [64,77) count each CRC bit's contributing payload bits
    # (CRC_M rows >= 77 are all-zero, so no payload masking is needed).
    # One shared floor pass then yields both parities.
    parcrc = np.zeros((128, 128), np.float32)
    parcrc[:, : T.N_CHECKS] = t["COUNT_M"]
    parcrc[:77, _CRC_LANE : _CRC_LANE + 13] = t["CRC_M"]
    # lane masks packed as one (8, 512) f32 operand:
    # row 0: edge_valid; row 2 lanes<38: ones (check mask);
    # row 3 lanes [77,90): ones (CRC field of the codeword);
    # row 4 lanes [64,77): ones (CRC lanes of the parcrc output)
    masks = np.zeros((8, _EPAD), np.float32)
    masks[0, :_NE] = t["edge_valid_f"]
    masks[2, : T.N_CHECKS] = 1.0
    masks[3, 77:90] = 1.0
    masks[4, _CRC_LANE : _CRC_LANE + 13] = 1.0
    return {
        "SEL_BIT": sel_bit.astype(jnp.bfloat16),
        "SEL_SUM": sel_sum.astype(jnp.bfloat16),
        "GRP": grp.astype(jnp.bfloat16),
        "BACK": back.astype(jnp.bfloat16),
        "PARCRC": parcrc.astype(jnp.bfloat16),
        "MASKS": masks,
    }


def _split3(x):
    h = x.astype(jnp.bfloat16)
    r1 = x - h.astype(jnp.float32)
    m = r1.astype(jnp.bfloat16)
    l = (r1 - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _split2(x):
    """16-bit split: enough for the log-domain sums in native mode (abs
    error ~3e-4 on a +-80-range log2 -> <0.1% after exp2, below the bf16
    message noise the native mode already carries)."""
    h = x.astype(jnp.bfloat16)
    return h, (x - h.astype(jnp.float32)).astype(jnp.bfloat16)


def _dot_bf16(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _sel_dot(x, sel_bf16):
    """x (f32 data) @ one-hot selection matrix, bit-exact via 3x bf16 (each
    output copies exactly one f32 input, reconstructed exactly from the
    3x8-bit mantissa split). Used in interpreter mode too: exact is exact."""
    xh, xm, xl = _split3(x)
    return _dot_bf16(xh, sel_bf16) + _dot_bf16(xm, sel_bf16) + _dot_bf16(
        xl, sel_bf16)


def _bp_kernel(max_iters: int, fast: bool,
               llr_ref, valid_ref,
               sel_bit, sel_sum_r, grp_r, back_r, parcrc_r, masks_ref,
               cw_out, meta_out,
               tov_ref, state_ref):
    llr = llr_ref[:, :]
    k = llr.shape[0]
    valid = valid_ref[:, 0:1] != 0  # (K, 1)
    sel_bit = sel_bit[:, :]
    sel_sum = sel_sum_r[:, :]
    grp = grp_r[:, :]
    back = back_r[:, :]
    parcrc = parcrc_r[:, :]
    edge_valid = masks_ref[0:1, :] != 0.0
    check_mask = masks_ref[2:3, 0:128]
    crc_mask = masks_ref[3:4, 0:128]
    crclane_mask = masks_ref[4:5, 0:128]
    hard_in = llr > 0.0

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (k, 128), 1)

    # state lanes: 0 = found, 1 = iterations, 2 = hard errors
    state_ref[:, :] = jnp.zeros((k, 128), jnp.float32)
    cw_out[:, :] = jnp.zeros((k, 128), jnp.float32)
    tov_ref[:, :] = jnp.zeros((k, _EPAD), jnp.float32)

    def body(it, _):
        tov_e = tov_ref[:, :]  # (K, 512) edge layout
        # per-bit sums of the <=3 incident messages: one summing matmul per
        # bf16 split part (3 matmuls, was 9 slot-separated; padded edge
        # columns are all-zero). Mirrors ops/ldpc.py body() exactly — the
        # MXU's f32 accumulator adds the <=3 exact products in contraction
        # order, same as XLA's dot on the jnp path.
        # native mode: the message copies/sums run at 1-pass bf16 (~2^-8
        # LLR noise, same class as the native softbits; the LOG-domain sums
        # below stay exact-split — bf16 absolute error on a +-80-range log
        # would be ~0.3, a ~25% magnitude error after exp2)
        zn = llr
        for part in ((tov_e.astype(jnp.bfloat16),) if fast
                     else _split3(tov_e)):
            zn = zn + _dot_bf16(part, sel_sum)
        cw = (zn > 0.0).astype(jnp.float32)  # (K, 128) 0/1

        # parity + CRC gates in ONE matmul + one floor pass (single-pass
        # bf16: 0/1 operands, counts <= 90 exact in the f32 accumulator):
        # lanes<38 hold check-row sums, lanes [64,77) CRC-bit sums
        cw16 = cw.astype(jnp.bfloat16)
        row_sum = _dot_bf16(cw16, parcrc)  # (K, 128)
        row_par = row_sum - 2.0 * jnp.floor(row_sum * 0.5)
        # cw's own CRC field (lanes 77:90) rolled onto the CRC output lanes;
        # unsatisfied checks and CRC mismatches sum into one reduction
        cw_crc = pltpu.roll(cw * crc_mask, 128 - (77 - _CRC_LANE), 1)
        bad = (row_par * check_mask
               + jnp.abs(row_par - cw_crc[:, 0:128]) * crclane_mask)
        nbad = jnp.sum(bad, axis=-1, keepdims=True)
        nerr = jnp.sum(jnp.abs(cw - hard_in.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        ok = ((nbad == 0.0)
              & (nerr < float(C.MAX_HARD_ERRORS)) & valid)  # (K, 1)

        st = state_ref[:, :]
        found = st[:, 0:1] != 0.0
        newly = ok & (~found)  # (K, 1)
        cw_out[:, :] = jnp.where(newly, cw, cw_out[:, :])
        lane = lane128
        upd = jnp.where(lane == 0, 1.0,
                        jnp.where(lane == 1, it.astype(jnp.float32),
                                  jnp.where(lane == 2, nerr, st)))
        state_ref[:, :] = jnp.where(newly, upd, st)

        # bit -> check; tov is already per-edge
        if fast:
            zn_e = _dot_bf16(zn.astype(jnp.bfloat16), sel_bit)  # (K, 512)
        else:
            zn_e = _sel_dot(zn, sel_bit)
        toc = zn_e - tov_e
        t = jnp.where(edge_valid, jnp.tanh(-0.5 * toc), 1.0)

        # leave-one-out via log-domain group sums (mirrors
        # ops.ldpc._loo_log_domain op for op — bit-identical): the group-sum
        # and broadcast matmuls are exact-copy sums of split-3 parts.
        # (A fused GRPSUM = GRP @ BACK single matmul lost in both modes on
        # v5e — BP is MXU-FLOP-bound and the (512, 512) fused operand costs
        # 2x the two-step FLOPs; see ops/ldpc._tables.)
        lt = jnp.log2(jnp.maximum(jnp.abs(t), _LOG_FLOOR))
        lsplit = _split2 if fast else _split3
        S = jnp.zeros((k, 128), jnp.float32)
        for part in lsplit(lt):
            S = S + _dot_bf16(part, grp)
        S_e = jnp.zeros((k, _EPAD), jnp.float32)
        for part in lsplit(S):
            S_e = S_e + _dot_bf16(part, back)
        mag = jnp.exp2(S_e - lt)
        neg = jnp.where((t < 0.0) & edge_valid, 1.0, 0.0)
        negc = _dot_bf16(neg.astype(jnp.bfloat16), grp)
        negc_e = _dot_bf16(negc.astype(jnp.bfloat16), back)
        others = negc_e - neg
        odd = others - 2.0 * jnp.floor(others * 0.5)
        loo = (1.0 - 2.0 * odd) * mag

        # check -> bit messages stay in edge layout (padded lanes zeroed)
        tov_ref[:, :] = jnp.where(edge_valid, 2.0 * platanh(-loo), 0.0)
        return 0

    jax.lax.fori_loop(0, max_iters, body, 0)
    meta_out[:, :] = state_ref[:, :]


_ROW_CHUNK = 1024  # rows per grid step: VMEM ~25 MB of (chunk, 512) arrays


def bp_decode_pallas(llr: jnp.ndarray, valid: jnp.ndarray,
                     max_iters: int = C.NUM_BP_ITERATIONS,
                     interpret: bool | None = None,
                     fast_math: bool = False) -> BPResult:
    """Drop-in replacement for ops.ldpc.bp_decode via one fused kernel.

    llr: (K, 128) float32; valid: (K,) bool. K must be a multiple of 8
    (cfg.max_survivors always is). Rows are fully independent, so callers
    SHOULD flat-batch multiple windows' survivor batches into one call
    (rows beyond _ROW_CHUNK tile onto the grid): the kernel body is
    op-dispatch-bound (~45 vector ops x 10 iterations), and a vmap'd
    per-window call re-pays that per window (measured 0.091 ms/win at
    K=512 vmap'd vs ~0.03 flat-batched at batch 16 on v5e).
    interpret=None: auto (interpreter off TPU, compiled on TPU).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tbl = _kernel_tables()
    k = llr.shape[0]
    valid_col = jnp.broadcast_to(
        valid.astype(jnp.int32)[:, None], (k, 128))

    chunk = min(k, _ROW_CHUNK)
    kpad = -k % chunk  # rows padded up to a chunk multiple (all-zero LLRs,
    # valid=0: they can never set found, and a (chunk, 512) scratch stays
    # within VMEM no matter how many windows are flat-batched — a 6-window
    # x K=4848 busy-band batch is 29088 rows, unchunked scratch would be
    # ~60 MB)
    if kpad:
        llr = jnp.pad(llr, ((0, kpad), (0, 0)))
        valid_col = jnp.pad(valid_col, ((0, kpad), (0, 0)))
    nstep = (k + kpad) // chunk

    kernel = functools.partial(_bp_kernel, max_iters,
                               fast_math and not interpret)
    row_spec = pl.BlockSpec((chunk, 128), lambda s: (s, 0),
                            memory_space=pltpu.VMEM)
    const = pl.BlockSpec(memory_space=pltpu.VMEM)
    cw, meta = pl.pallas_call(
        kernel,
        grid=(nstep,),
        in_specs=[row_spec, row_spec] + [const] * 6,
        out_specs=[row_spec, row_spec],
        out_shape=[
            jax.ShapeDtypeStruct((k + kpad, 128), jnp.float32),
            jax.ShapeDtypeStruct((k + kpad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((chunk, _EPAD), jnp.float32),  # tov (edge layout)
            pltpu.VMEM((chunk, 128), jnp.float32),  # found/iter/nerr state
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(llr, valid_col, tbl["SEL_BIT"], tbl["SEL_SUM"], tbl["GRP"],
      tbl["BACK"], tbl["PARCRC"], jnp.asarray(tbl["MASKS"]))
    if kpad:
        cw, meta = cw[:k], meta[:k]

    return BPResult(
        found=meta[:, 0] != 0.0,
        codeword=cw.astype(jnp.int8),
        iterations=meta[:, 1].astype(jnp.int32),
        hard_errors=meta[:, 2].astype(jnp.int32),
    )
