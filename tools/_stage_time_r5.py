"""Round-5 per-stage loop-method timing at the CURRENT defaults (dec=4,
K=256) on TPU — where does the scan-stubbed ~0.1 ms/win floor go?

Times each stage as wired in pipeline.decode_windows (vmapped scan,
prefilter_select, window-batched tiered demod, flat-batch BP, finish), plus
the full decode_raw marginal. Dev probe; loop-method marginals at B=16.
"""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan
from msk144cudecoder_tpu.runtime.jaxcache import enable_persistent_cache
enable_persistent_cache()

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3)
freqs = tuple(float(f) for f in cfg.freqs)
P = cfg.scan_depth
K = cfg.max_survivors
PRE = 2 * K
DEC = cfg.scan_decimation
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
print(f"device={jax.devices()[0]} B={B} K={K} PRE={PRE} dec={DEC}", flush=True)

c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
scan_fn = jax.jit(lambda cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
    w, freqs, P, fast_math=cfg.fast_math, dec=DEC))(cc))
pos, xb = scan_fn(c)
per_cell = cfg.prefilter_per_cell
pf_fn = jax.jit(lambda p_, x_: jax.vmap(
    lambda pw, xw: pipeline.prefilter_select(xw, pw, PRE, per_cell, None)
)(p_, x_))
front = pf_fn(pos, xb)
dm_fn = jax.jit(lambda cc, f1, f2, f3: pipeline._demod_tiered_batched(
    cc, freqs, cfg, f1, f2, f3, P))
sb_f, nbad_f = dm_fn(c, front[1], front[2], front[3])
bp_in = jax.jit(lambda s, n: (s.reshape(-1, 128) * 1.0,
                              (n.reshape(-1) <= cfg.nbadsync_threshold)))(
    sb_f, nbad_f)
jax.block_until_ready((bp_in, front))


def loop_time(step, x0, aux=(), n_lo=4, n_hi=16, iters=3):
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


def report(name, t):
    print(f"{name:16s} {t/B*1e3:7.4f} ms/win", flush=True)


def full_step(r_):
    res = pipeline.decode_raw(r_, cfg)
    return r_ + (res.nbadsync[:, 0] % 2)[:, None].astype(jnp.int16)
report("FULL", loop_time(full_step, raw))

report("preprocess", loop_time(
    lambda r: (r + (jnp.sum(jnp.abs(pipeline.preprocess(r, cfg)))
               % 2.0).astype(jnp.int16)), raw))


def scan_step(cc):
    p_, x_ = jax.vmap(lambda w: pallas_scan.scan_pallas(
        w, freqs, P, fast_math=cfg.fast_math, dec=DEC))(cc)
    return cc + (x_[:, 0, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
report("scan(dec4)", loop_time(scan_step, c))


def pf_step(x_, p_):
    f = jax.vmap(lambda pw, xw: pipeline.prefilter_select(
        xw, pw, PRE, per_cell, None))(p_, x_)
    return x_ + (f[0][:, 0] % 1.0)[:, None, None, None] * 1e-20
report("prefilter", loop_time(pf_step, xb, (pos,)))


def dm_step(cc, f1, f2, f3):
    sb, nb = pipeline._demod_tiered_batched(cc, freqs, cfg, f1, f2, f3, P)
    return cc + (sb[:, 0, 0] % 1.0)[:, None].astype(jnp.complex64) * 1e-20
report("tiered demod", loop_time(dm_step, c, (front[1], front[2], front[3])))


def bp_step(llr, valid):
    bp = pipeline.bp_stage(llr, valid, cfg)
    return llr + (bp.found[:, None] * 1e-20).astype(jnp.float32)
report("BP", loop_time(bp_step, bp_in[0], (bp_in[1],)))
