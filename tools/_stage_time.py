"""Per-stage loop-method timing of the CURRENT prefiltered pipeline on TPU.

Each stage is timed as a jitted fori_loop whose digest feeds the next
iteration's input (no DCE, marginal cost). Dev probe.
"""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import ldpc, pipeline, pallas_scan, pallas_survivor

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
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
dm = jax.jit(lambda cc, p_, f_, q_: jax.vmap(
    lambda w, pp, ff, qq: pallas_survivor.demod_survivors(w, freqs, pp, ff, qq)
)(cc, p_, f_, q_))
sb_f, nbad_f = dm(c, pos_f, f_idx, p_idx)
segs = pipeline.split_quota(PRE, P)
offs = np.cumsum([0] + segs)
quotas = list(zip(pipeline.split_quota(K, P),
                  [slice(int(offs[i]), int(offs[i+1])) for i in range(P)]))
sel = jax.jit(lambda n_, x_: jax.vmap(
    lambda nn, xx: pipeline.select_survivors_quota(nn, xx, K, 3, quotas)
)(n_, x_))
top_idx = sel(nbad_f, xb_f)
jax.block_until_ready(top_idx)


def loop_time(step, x0, aux=(), n_lo=4, n_hi=16, iters=3):
    """step(x, *aux) -> x-like (same shape/dtype): chained in fori_loop."""
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(x, aux):
            out = jax.lax.fori_loop(0, n, lambda i, s: step(s, *aux), x)
            # f32 scalar digest: complex D2H is unimplemented on this
            # runtime, and only a real device->host READ synchronizes
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


# 1. preprocess: int16 raw -> complex; chain via digest-added raw
report("preprocess", loop_time(
    lambda r: (r + (jnp.sum(jnp.abs(pipeline.preprocess(r, cfg)))
               % 2.0).astype(jnp.int16)), raw))
# 2. scan
def scan_step(cc):
    p_, x_ = jax.vmap(lambda w: pallas_scan.scan_pallas(w, freqs, P))(cc)
    return cc + (x_[:, 0, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
report("scan", loop_time(scan_step, c))
# 3. prefilter select
def pf_step(x_, p_):
    xs, ps, fs, qs, fl = jax.vmap(
        lambda pw, xw: pipeline.prefilter_select(xw, pw, PRE, per_cell, None)
    )(p_, x_)
    return x_ + (xs[:, 0] % 1.0)[:, None, None, None] * 1e-20
report("prefilter", loop_time(pf_step, xb, (pos,)))
# 4. survivor demod
def dm_step(p_, cc, f_, q_):
    sb, nb = jax.vmap(lambda w, pp, ff, qq: pallas_survivor.demod_survivors(
        w, freqs, pp, ff, qq))(cc, p_, f_, q_)
    return p_ + nb % 2  # nb%1 == 0 would be DCE'd
report("demod", loop_time(dm_step, pos_f, (c, f_idx, p_idx)))
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
# 6. BP (K=512)
llr = sb_f[:, :K, :]
valid = nbad_f[:, :K] <= 3
def bp_step(l_, v_):
    r = jax.vmap(ldpc.bp_decode)(l_, v_)
    return l_ + r.iterations[:, :, None].astype(jnp.float32) * 1e-20
report("bp", loop_time(bp_step, llr, (valid,)))
# 7. final compaction
r_n = cfg.max_results
def comp_step(l_,):
    def one(ll):
        found = ll[:, 0] > 2.0
        key = found.astype(jnp.int32) * (1 << 20) - jnp.arange(K, dtype=jnp.int32)
        _, s2 = jax.lax.top_k(key, r_n)
        return pipeline.take_rows_exact(ll[:, :85], s2)
    out = jax.vmap(one)(l_)
    return l_ + (out[:, 0, 0] % 1.0)[:, None, None] * 1e-20
report("compaction", loop_time(comp_step, llr))
