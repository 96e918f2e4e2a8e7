"""Cumulative-prefix profiling of the PREFILTERED deep-scan pipeline
(ops/pipeline.py decode path with survivor_prefilter active): times
jit(prefix) for successively longer prefixes with chained data-dependent
dispatches (see profile_prefix.py for the method). Row deltas = stage cost
including XLA glue.

Usage: python tools/profile_prefilter.py [--batch 16] [--pre 1024]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from msk144cudecoder_tpu import constants as C  # noqa: E402
from msk144cudecoder_tpu.config import DecoderConfig  # noqa: E402
from msk144cudecoder_tpu.ops import ldpc, pipeline  # noqa: E402
from msk144cudecoder_tpu.ops import pallas_scan, pallas_survivor  # noqa: E402


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def chain_time(step, x0, m=8, iters=3):
    x = step(x0)
    fetch(x)
    ts = []
    for _ in range(iters):
        x = x0
        t0 = time.perf_counter()
        for _ in range(m):
            x = step(x)
        fetch(x)
        ts.append((time.perf_counter() - t0) / m)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--pre", type=int, default=1024)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()
    b = args.batch

    cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                        nbadsync_threshold=3, max_survivors=512,
                        survivor_prefilter=args.pre)
    freqs = tuple(float(f) for f in cfg.freqs)
    nc_tot = cfg.num_candidates
    pre_n = args.pre
    print(f"device={jax.devices()[0]} F={cfg.num_freqs} P={cfg.scan_depth} "
          f"K={cfg.max_survivors} PRE={pre_n} B={b}", flush=True)

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16))

    def scan_st(c):
        return jax.vmap(lambda w: pallas_scan.scan_pallas(
            w, freqs, cfg.scan_depth))(c)

    def prefilter_st(pos, xb):
        def one(posw, xbw):
            xb_sel, pre_idx = jax.lax.top_k(xbw.reshape(nc_tot), pre_n)
            per_f = posw.shape[1] * posw.shape[2]
            return (xb_sel, pre_idx, pre_idx // per_f,
                    (pre_idx % per_f) // posw.shape[2],
                    posw.reshape(nc_tot)[pre_idx])
        return jax.vmap(one)(pos, xb)

    def demod_st(c, pos_s, f_idx, p_idx):
        return jax.vmap(lambda w, p_, f_, q_: pallas_survivor.demod_survivors(
            w, freqs, p_, f_, q_))(c, pos_s, f_idx, p_idx)

    k = min(cfg.max_survivors, pre_n)

    def select_st(nbad_f, xb_f):
        return jax.vmap(lambda n, x: pipeline.select_survivors_topk(
            n, x, k, cfg.nbadsync_threshold))(nbad_f, xb_f)

    def prefix(depth):
        def f(r):
            c = pipeline.preprocess(r, cfg)
            if depth == 1:
                return jnp.sum(jnp.abs(c[:, :8]))
            pos, xb = scan_st(c)
            if depth == 2:
                return jnp.sum(xb[:, 0, 0, 0])
            xb_f, pre_idx, f_idx, p_idx, pos_s = prefilter_st(pos, xb)
            if depth == 3:
                return jnp.sum(pos_s[:, :4]).astype(jnp.float32)
            sb_f, nbad_f = demod_st(c, pos_s, f_idx, p_idx)
            if depth == 4:
                return jnp.sum(sb_f[:, 0, :4])
            top = select_st(nbad_f, xb_f)
            if depth == 5:
                return jnp.sum(top[:, :4]).astype(jnp.float32)
            nbad_k = jnp.take_along_axis(nbad_f, top, axis=1)
            valid = nbad_k <= cfg.nbadsync_threshold
            llr = jax.vmap(lambda s, t: s[t])(sb_f, top)
            bp = jax.vmap(ldpc.bp_decode)(llr, valid)
            if depth == 6:
                return jnp.sum(bp.found[:, :4].astype(jnp.float32))
            raise ValueError(depth)
        return jax.jit(f)

    names = ["pre", "+scan", "+prefilter", "+surv demod", "+select",
             "+gather/BP"]
    prev = 0.0
    for d in range(1, 7):
        fn = prefix(d)

        def step(x, _fn=fn, _raw=raw):
            z = (_fn(x) * 0).astype(jnp.int16)
            return _raw + z
        t = chain_time(step, raw, m=8, iters=args.iters)
        print(f"prefix {names[d-1]:12s}: {t/b*1e3:7.3f} ms/win "
              f"(delta {(t - prev)/b*1e3:7.3f})", flush=True)
        prev = t

    full = jax.jit(lambda r: pipeline.decode_raw(r, cfg))

    def step(x):
        r = full(x)
        z = (r.num_survivors[0] & 0).astype(jnp.int16)
        return raw + z
    t = chain_time(step, raw, m=8, iters=args.iters)
    rtf = C.HOP_LEN / (t / b) / C.SAMPLE_RATE
    print(f"full pipeline   : {t/b*1e3:7.3f} ms/win "
          f"(delta {(t - prev)/b*1e3:7.3f} = result compaction) "
          f"rtf={rtf:.1f}x", flush=True)


if __name__ == "__main__":
    main()
