"""Per-stage and per-batch-size timing on the current JAX device.

Separates fixed dispatch latency (tunnel round trips) from real compute by
timing a trivial op, then each pipeline stage, at several batch sizes.
Usage: python tools/profile_stages.py [--deep] [--batches 1,8,32]
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
from msk144cudecoder_tpu.ops import ldpc, pipeline, scan, softbits  # noqa: E402


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--deep", action="store_true")
    p.add_argument("--batches", type=str, default="1,4,16")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    cfg = (DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                         nbadsync_threshold=3, max_survivors=512)
           if args.deep else
           DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128))
    freqs = tuple(float(f) for f in cfg.freqs)
    print(f"device={jax.devices()[0]} F={cfg.num_freqs} P={cfg.scan_depth} "
          f"K={cfg.max_survivors}", file=sys.stderr)

    rng = np.random.default_rng(0)

    trivial = jax.jit(lambda x: x * 2.0 + 1.0)
    xsmall = jnp.ones((8, 128), jnp.float32)
    print(f"dispatch floor (trivial jit): {timeit(trivial, xsmall, iters=20)*1e3:8.2f} ms")

    pre = jax.jit(lambda r: pipeline.preprocess(r, cfg))
    scan_fn = jax.jit(lambda c: scan.scan(c[0], freqs, cfg.scan_depth))
    demod_fn = jax.jit(
        lambda c, pos: softbits.demod_candidates(c[0], freqs, cfg.scan_depth, pos))
    K = min(cfg.max_survivors, cfg.num_candidates)
    ldpc_fn = jax.jit(lambda llr, v: ldpc.bp_decode(llr, v))
    full = jax.jit(lambda r: pipeline.decode_raw(r, cfg))

    for b in [int(x) for x in args.batches.split(",")]:
        raw = rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16)
        rj = jnp.asarray(raw)
        t_pre = timeit(pre, rj, iters=args.iters)
        c = pre(rj)
        t_scan = timeit(scan_fn, c, iters=args.iters) * b  # single window x b
        pos, xb = scan_fn(c)
        t_demod = timeit(demod_fn, c, pos, iters=args.iters) * b
        llr = jnp.asarray(rng.normal(0, 2, (K, 128)).astype(np.float32))
        vmask = jnp.ones((K,), bool)
        t_ldpc = timeit(ldpc_fn, llr, vmask, iters=args.iters) * b
        t_full = timeit(full, rj, iters=args.iters)
        per_win = t_full / b
        rtf = C.HOP_LEN / per_win / C.SAMPLE_RATE
        print(f"B={b:3d}  pre={t_pre*1e3:7.2f}  scan~={t_scan*1e3:7.2f}  "
              f"demod~={t_demod*1e3:7.2f}  ldpc~={t_ldpc*1e3:7.2f}  "
              f"full={t_full*1e3:8.2f} ms  {per_win*1e3:7.2f} ms/win  rtf={rtf:8.1f}x")


if __name__ == "__main__":
    main()
