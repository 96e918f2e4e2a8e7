"""Honest cumulative-stage timing of the (Pallas) pipeline on the current
device: pre+scan / +demod / +select / full, each digest-fetched per call.

Usage: python tools/profile_pipeline.py [--batch 16] [--deep]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msk144cudecoder_tpu import constants as C  # noqa: E402
from msk144cudecoder_tpu.config import DecoderConfig  # noqa: E402
from msk144cudecoder_tpu.ops import ldpc, pallas_demod, pallas_scan, pipeline  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--quick", action="store_true")
    args = p.parse_args()

    cfg = (DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128)
           if args.quick else
           DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                         nbadsync_threshold=3, max_survivors=512))
    freqs = tuple(float(f) for f in cfg.freqs)
    B = args.batch
    rng = np.random.default_rng(0)
    raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
    print(f"device={jax.devices()[0]} F={cfg.num_freqs} P={cfg.scan_depth} B={B}",
          file=sys.stderr)

    def timeit(tag, fn):
        d = np.asarray(fn(raw))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            d = np.asarray(fn(raw))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{tag:24s}: {dt*1e3:8.2f} ms/call  {dt/B*1e3:7.3f} ms/win", flush=True)

    def stage_scan(r):
        c = pipeline.preprocess(r, cfg)
        pos, xb = jax.vmap(lambda w: pallas_scan.scan_pallas(w, freqs, cfg.scan_depth))(c)
        return xb.sum()

    def stage_demod(r):
        c = pipeline.preprocess(r, cfg)
        def one(w):
            pos, xb = pallas_scan.scan_pallas(w, freqs, cfg.scan_depth)
            sb, nb = pallas_demod.demod_pallas(w, freqs, pos)
            return sb.sum() + nb.sum()
        return jax.vmap(one)(c).sum()

    def stage_select(r):
        c = pipeline.preprocess(r, cfg)
        def one(w):
            pos, xb = pallas_scan.scan_pallas(w, freqs, cfg.scan_depth)
            sb, nbad = pallas_demod.demod_pallas(w, freqs, pos)
            nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
            k = min(cfg.max_survivors, nc)
            xb_f = xb.reshape(nc)
            nbad_f = nbad.reshape(nc)
            sb_f = sb.reshape(nc, 128)
            key = -nbad_f.astype(jnp.float32) * 1e9 + jnp.minimum(xb_f, 1e8)
            _, top_idx = jax.lax.top_k(key, k)
            return sb_f[top_idx].sum() + nbad_f[top_idx].sum()
        return jax.vmap(one)(c).sum()

    def full(r):
        res = pipeline.decode_raw(r, cfg)
        return res.found.sum() + res.xb.sum()

    timeit("pre+scan", jax.jit(stage_scan))
    timeit("pre+scan+demod", jax.jit(stage_demod))
    timeit("pre+scan+demod+select", jax.jit(stage_select))
    timeit("full pipeline", jax.jit(full))


if __name__ == "__main__":
    main()
