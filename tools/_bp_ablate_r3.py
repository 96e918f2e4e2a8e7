"""Ablation timing of the Pallas BP kernel on TPU (dev probe).

HISTORICAL: this measured the ROUND-3-START kernel (slot-select matmuls +
masked doubling scans) and attributed its cost (zn selects 27 us/win, loo
scans 27 us/win), motivating the SEL_SUM and log-domain rewrites. It
snapshots that kernel's structure and needs the pre-a12c4dc _kernel_tables
(SEL_SLOT0..2, jmod mask row) to run — check out an older tree to re-run.
"""
import functools
import sys, time
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.protocol import ldpc_tables as T
from msk144cudecoder_tpu.ops.ldpc import platanh
from msk144cudecoder_tpu.ops import pallas_ldpc as PL

_NE = T.N_CHECKS * T.MAX_ROW_DEGREE
_EPAD = 512
B = 16
K = 512
rng = np.random.default_rng(0)
llr = jax.device_put(rng.normal(0, 4, (B, K, 128)).astype(np.float32))
valid = jax.device_put(np.ones((B, K), bool))
print(f"device={jax.devices()[0]} B={B} K={K}", flush=True)


def _bp_kernel_abl(max_iters, mode,
                   llr_ref, valid_ref,
                   sel_bit, sel_s0, sel_s1, sel_s2, count_m, crc_m, masks_ref,
                   cw_out, meta_out,
                   tov_ref, state_ref):
    llr = llr_ref[:, :]
    k = llr.shape[0]
    valid = valid_ref[:, 0:1] != 0
    sel_bit = sel_bit[:, :]
    sel_slots = (sel_s0[:, :], sel_s1[:, :], sel_s2[:, :])
    count_m = count_m[:, :]
    crc_m = crc_m[:, :]
    edge_valid = masks_ref[0:1, :] != 0.0
    jmod = masks_ref[1:2, :]
    check_mask = masks_ref[2:3, 0:128]
    crc_mask = masks_ref[3:4, 0:128]
    hard_in = llr > 0.0
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (k, 128), 1)
    in77 = lane128 < 77
    state_ref[:, :] = jnp.zeros((k, 128), jnp.float32)
    cw_out[:, :] = jnp.zeros((k, 128), jnp.float32)
    tov_ref[:, :] = jnp.zeros((k, _EPAD), jnp.float32)

    def body(it, _):
        tov_e = tov_ref[:, :]
        if mode == "nozn":
            zn = llr + tov_e[:, 0:128]
        else:
            zn = llr
            for sel_k in sel_slots:
                zn = zn + PL._sel_dot(tov_e, sel_k)
        cw = (zn > 0.0).astype(jnp.float32)
        if mode == "nogate":
            ok = valid & (cw[:, 0:1] > 2.0)
            nerr = cw[:, 0:1]
        else:
            cw16 = cw.astype(jnp.bfloat16)
            row_sum = PL._dot_bf16(cw16, count_m)
            row_par = row_sum - 2.0 * jnp.floor(row_sum * 0.5)
            ncheck = jnp.sum(row_par * check_mask, axis=-1, keepdims=True)
            crc_bits = PL._dot_bf16(
                jnp.where(in77, cw, 0.0).astype(jnp.bfloat16), crc_m)
            crc_bits = crc_bits - 2.0 * jnp.floor(crc_bits * 0.5)
            cw_crc = pltpu.roll(cw * crc_mask, 128 - 77, 1)
            crc_diff = jnp.sum(jnp.abs(crc_bits - cw_crc[:, 0:128])
                               * (lane128 < 13), axis=-1, keepdims=True)
            nerr = jnp.sum(jnp.abs(cw - hard_in.astype(jnp.float32)),
                           axis=-1, keepdims=True)
            ok = ((ncheck == 0.0) & (crc_diff == 0.0)
                  & (nerr < float(C.MAX_HARD_ERRORS)) & valid)
        st = state_ref[:, :]
        found = st[:, 0:1] != 0.0
        newly = ok & (~found)
        cw_out[:, :] = jnp.where(newly, cw, cw_out[:, :])
        upd = jnp.where(lane128 == 0, 1.0,
                        jnp.where(lane128 == 1, it.astype(jnp.float32),
                                  jnp.where(lane128 == 2, nerr, st)))
        state_ref[:, :] = jnp.where(newly, upd, st)

        if mode == "noselbit":
            zn_e = jnp.broadcast_to(zn[:, 0:1], (k, _EPAD))
        else:
            zn_e = PL._sel_dot(zn, sel_bit)
        toc = zn_e - tov_e
        if mode == "notanh":
            t = jnp.where(edge_valid, -0.5 * toc, 1.0)
        else:
            t = jnp.where(edge_valid, jnp.tanh(-0.5 * toc), 1.0)
        if mode == "noloo":
            loo = t * 0.5
        else:
            pf = t
            for s in (1, 2, 4, 8):
                pf = pf * jnp.where(jmod >= s, pltpu.roll(pf, s, 1), 1.0)
            sf = t
            for s in (1, 2, 4, 8):
                sf = sf * jnp.where(jmod < T.MAX_ROW_DEGREE - s,
                                    pltpu.roll(sf, _EPAD - s, 1), 1.0)
            pf = jnp.where(jmod >= 1, pltpu.roll(pf, 1, 1), 1.0)
            sf = jnp.where(jmod < T.MAX_ROW_DEGREE - 1,
                           pltpu.roll(sf, _EPAD - 1, 1), 1.0)
            loo = pf * sf
        tov_ref[:, :] = jnp.where(edge_valid, 2.0 * platanh(-loo), 0.0)
        return 0

    jax.lax.fori_loop(0, max_iters, body, 0)
    meta_out[:, :] = state_ref[:, :]


def bp_variant(llr2, valid2, mode):
    tbl = PL._kernel_tables()
    k = llr2.shape[0]
    valid_col = jnp.broadcast_to(valid2.astype(jnp.int32)[:, None], (k, 128))
    kernel = functools.partial(_bp_kernel_abl, C.NUM_BP_ITERATIONS, mode)
    vspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    cw, meta = pl.pallas_call(
        kernel,
        in_specs=[vspec] * 9,
        out_specs=[vspec, vspec],
        out_shape=[
            jax.ShapeDtypeStruct((k, 128), jnp.float32),
            jax.ShapeDtypeStruct((k, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((k, _EPAD), jnp.float32),
            pltpu.VMEM((k, 128), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(llr2, valid_col, tbl["SEL_BIT"], tbl["SEL_SLOT0"], tbl["SEL_SLOT1"],
      tbl["SEL_SLOT2"], tbl["COUNT_M"], tbl["CRC_M"],
      jnp.asarray(tbl["MASKS"]))
    return cw, meta


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


for mode in ("full", "nozn", "noselbit", "nogate", "notanh", "noloo"):
    def step(l_, v_, mode=mode):
        cw, meta = jax.vmap(lambda a, b: bp_variant(a, b, mode))(l_, v_)
        return l_ + meta[:, :, :1] * 1e-20
    t = loop_time(step, llr, (valid,))
    print(f"bp[{mode:9s}] {t/B*1e3:7.3f} ms/win", flush=True)
