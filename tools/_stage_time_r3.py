"""Round-3 per-stage loop-method timing of the CURRENT pipeline on TPU.

Times every stage of the deep-scan Pallas path as actually wired in
ops/pipeline.decode_window_tables (tiered survivor demod, Pallas BP,
lag-matrix prep separated out), plus the full decode_raw marginal.
Dev probe; see tools/profile_r2.py for the loop-method rationale.
"""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan, pallas_survivor, pallas_ldpc

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3)  # K = the current default
freqs = tuple(float(f) for f in cfg.freqs)
PRE = 2 * cfg.max_survivors
K = cfg.max_survivors
P = cfg.scan_depth
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
print(f"device={jax.devices()[0]} B={B} PRE={PRE} K={K}", flush=True)

# realistic intermediates, computed once
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
pos, xb = jax.jit(lambda cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
    w, freqs, P))(cc))(c)
per_cell = 2
pf = jax.jit(lambda p_, x_: jax.vmap(
    lambda pw, xw: pipeline.prefilter_select(xw, pw, PRE, per_cell, None)
)(p_, x_))
xb_f, pos_f, f_idx, p_idx, flat_idx = pf(pos, xb)

seg_sizes = pipeline.split_quota(PRE, P)
offs = np.cumsum([0] + seg_sizes)


def tiered_demod(w, pp, ff, qq):
    sb_parts, nbad_parts = [], []
    for p in range(P):
        tl = tuple(int(x) for x in np.nonzero(C.PATTERN_MASKS[p])[0])
        sl = slice(int(offs[p]), int(offs[p + 1]))
        n = seg_sizes[p]
        npad = -n % 8
        padz = lambda a: jnp.pad(a[sl], (0, npad))
        sbp, nbp = pallas_survivor.demod_survivors(
            w, freqs, padz(pp), padz(ff), padz(qq),
            sb_blk=n + npad, terms=tl)
        sb_parts.append(sbp[:n])
        nbad_parts.append(nbp[:n])
    return jnp.concatenate(sb_parts), jnp.concatenate(nbad_parts)


dm = jax.jit(lambda cc, p_, f_, q_: jax.vmap(tiered_demod)(cc, p_, f_, q_))
sb_f, nbad_f = dm(c, pos_f, f_idx, p_idx)
quotas = list(zip(pipeline.split_quota(K, P),
                  [slice(int(offs[i]), int(offs[i+1])) for i in range(P)]))
jax.block_until_ready(sb_f)


def loop_time(step, x0, aux=(), n_lo=4, n_hi=16, iters=3):
    """step(x, *aux) -> x-like (same shape/dtype): chained in fori_loop."""
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(x, aux):
            out = jax.lax.fori_loop(0, n, lambda i, s: step(s, *aux), x)
            return jnp.abs(jax.tree_util.tree_leaves(out)[0]
                           .ravel()[0]).astype(jnp.float32)
        fetch = lambda r: float(r)
        fetch(run(x0, aux))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            fetch(run(x0, aux))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def report(name, t):
    print(f"{name:16s} {t/B*1e3:7.3f} ms/win", flush=True)


# 0. full pipeline marginal
def full_step(r_):
    res = jax.vmap(lambda w: pipeline.decode_window(w, cfg))(
        pipeline.preprocess(r_, cfg))
    return r_ + (res.nbadsync[:, 0] % 2)[:, None].astype(jnp.int16)
report("FULL", loop_time(full_step, raw))

# 1. preprocess
report("preprocess", loop_time(
    lambda r: (r + (jnp.sum(jnp.abs(pipeline.preprocess(r, cfg)))
               % 2.0).astype(jnp.int16)), raw))

# 2a. lag-plane prep alone (row-built transposed planes + bnd)
def lag_step(cc):
    pls = jax.vmap(lambda w: pallas_scan.lag_planes(w, "split2"))(cc)
    bd = jax.vmap(pallas_scan.bnd_matrix)(cc)
    return cc + ((pls[:, 0, 0, 0].astype(jnp.float32)
                  + bd[:, 0, 0]) % 1.0)[:, None].astype(jnp.complex64) * 1e-20
report("lag_prep", loop_time(lag_step, c))

# 2b. scan (includes lag prep)
def scan_step(cc):
    p_, x_ = jax.vmap(lambda w: pallas_scan.scan_pallas(w, freqs, P))(cc)
    return cc + (x_[:, 0, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
report("scan+prep", loop_time(scan_step, c))

# 3. prefilter select
def pf_step(x_, p_):
    xs, ps, fs, qs, fl = jax.vmap(
        lambda pw, xw: pipeline.prefilter_select(xw, pw, PRE, per_cell, None)
    )(p_, x_)
    return x_ + (xs[:, 0] % 1.0)[:, None, None, None] * 1e-20
report("prefilter", loop_time(pf_step, xb, (pos,)))

# 4. tiered survivor demod (as wired)
def dm_step(p_, cc, f_, q_):
    sb, nb = jax.vmap(tiered_demod)(cc, p_, f_, q_)
    return p_ + nb % 2
report("demod(tiered)", loop_time(dm_step, pos_f, (c, f_idx, p_idx)))

# 5. K-select + row gather (one-hot)
def sel_step(n_, x_, s_, pp_, fl_):
    def one(nn, xx, ss, ppw, flw):
        ti = pipeline.select_survivors_quota(nn, xx, K, 3, quotas)
        meta = jnp.stack([nn.astype(jnp.float32), xx,
                          ppw.astype(jnp.float32),
                          flw.astype(jnp.float32)], axis=1)
        rows = pipeline.take_rows_exact(jnp.concatenate([ss, meta], axis=1), ti)
        return rows
    rows = jax.vmap(one)(n_, x_, s_, pp_, fl_)
    return n_ + (rows[:, 0, 128] % 1.0).astype(jnp.int32)[:, None]
report("select+rows", loop_time(sel_step, nbad_f, (xb_f, sb_f, pos_f, flat_idx)))

# 6. Pallas BP (K=512)
llr = sb_f[:, :K, :]
valid = nbad_f[:, :K] <= 3
def bp_step(l_, v_):
    r = jax.vmap(pallas_ldpc.bp_decode_pallas)(l_, v_)
    return l_ + r.iterations[:, :, None].astype(jnp.float32) * 1e-20
report("bp(pallas)", loop_time(bp_step, llr, (valid,)))

# 7. final compaction (two-key sort + one-hot rows, as wired)
r_n = cfg.max_results
def comp_step(l_,):
    def one(ll):
        found = ll[:, 0] > 2.0
        _, s2 = jax.lax.sort(
            ((~found).astype(jnp.int32), jnp.arange(K, dtype=jnp.int32)),
            num_keys=2)
        return pipeline.take_rows_exact(ll[:, :85], s2[:r_n])
    out = jax.vmap(one)(l_)
    return l_ + (out[:, 0, 0] % 1.0)[:, None, None] * 1e-20
report("compaction", loop_time(comp_step, llr))
