"""Cumulative-prefix profiling of the deep-scan pipeline on the current
device: times jit(prefix-of-pipeline) for successively longer prefixes with
the chained-dispatch method (data-dependent inputs defeat caching; one final
scalar fetch). Differences between consecutive rows give each stage's true
cost *including* the XLA glue between stages — which the loop-method
per-stage profiler (profile_r2.py) cannot see.

Usage: python tools/profile_prefix.py [--k 2] [--batch 16]
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
from msk144cudecoder_tpu.ops import pallas_demod, pallas_scan  # noqa: E402


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
    p.add_argument("--k", type=int, default=2)
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()
    b = args.batch

    cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                        nbadsync_threshold=3, max_survivors=512,
                        candidates_per_pattern=args.k)
    freqs = tuple(float(f) for f in cfg.freqs)
    nc_tot = cfg.num_candidates
    print(f"device={jax.devices()[0]} F={cfg.num_freqs} P={cfg.scan_depth} "
          f"k'={args.k} K={cfg.max_survivors} B={b}", flush=True)

    rng = np.random.default_rng(0)
    raw = jax.device_put(
        rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16))

    def pre(r):
        return pipeline.preprocess(r, cfg)

    def scan_st(c):
        return jax.vmap(lambda w: pallas_scan.scan_pallas(
            w, freqs, cfg.scan_depth, num_cand=args.k))(c)

    def demod_st(c, pos):
        return jax.vmap(lambda w, p_: pallas_demod.demod_pallas(
            w, freqs, p_))(c, pos)

    k = min(cfg.max_survivors, nc_tot)

    def select_st(nbad, xb):
        return jax.vmap(lambda n, x: pipeline.select_survivors(
            n.reshape(nc_tot), x.reshape(nc_tot), k))(nbad, xb)

    def prefix(depth):
        def f(r):
            c = pre(r)
            if depth == 1:
                return jnp.sum(jnp.abs(c[:, :8]))
            pos, xb = scan_st(c)
            if depth == 2:
                return jnp.sum(xb[:, 0, 0, 0])
            sb, nbad = demod_st(c, pos)
            if depth == 3:
                return jnp.sum(sb[:, 0, 0, 0, :4])
            top = select_st(nbad, xb)
            if depth == 4:
                return jnp.sum(top[:, :4]).astype(jnp.float32)
            nbad_f = jax.vmap(lambda n: n.reshape(nc_tot))(nbad)
            nbad_k = jnp.take_along_axis(nbad_f, top, axis=1)
            valid = nbad_k <= cfg.nbadsync_threshold
            sb_f = jax.vmap(lambda s: s.reshape(nc_tot, 128))(sb)
            llr = jax.vmap(lambda s, t: s[t])(sb_f, top)
            bp = jax.vmap(ldpc.bp_decode)(llr, valid)
            if depth == 5:
                return jnp.sum(bp.found[:, :4].astype(jnp.float32))
            raise ValueError(depth)
        return jax.jit(f)

    names = ["pre", "+scan", "+demod", "+select", "+gather/BP"]
    prev = 0.0
    for d in range(1, 6):
        fn = prefix(d)

        def step(x, _fn=fn, _raw=raw):
            z = (_fn(x) * 0).astype(jnp.int16)
            return _raw + z
        t = chain_time(step, raw, m=8, iters=args.iters)
        print(f"prefix {names[d-1]:11s}: {t/b*1e3:7.3f} ms/win "
              f"(delta {(t - prev)/b*1e3:7.3f})", flush=True)
        prev = t

    full = jax.jit(lambda r: pipeline.decode_raw(r, cfg))

    def step(x):
        r = full(x)
        z = (r.num_survivors[0] & 0).astype(jnp.int16)
        return raw + z
    t = chain_time(step, raw, m=8, iters=args.iters)
    rtf = C.HOP_LEN / (t / b) / C.SAMPLE_RATE
    print(f"full pipeline  : {t/b*1e3:7.3f} ms/win "
          f"(delta {(t - prev)/b*1e3:7.3f} = result compaction) rtf={rtf:.1f}x",
          flush=True)


if __name__ == "__main__":
    main()
