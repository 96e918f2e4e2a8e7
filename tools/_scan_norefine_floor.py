"""Does dec2-coarse WITHOUT odd-lag refine move the decode floor? (dev probe)

Patches ops.scan.select_candidates with the coarse protocol (slice argmax
over EVEN lags only — exactly what the decimated kernel produces, candidate
positions possibly 1 sample off the true peak) and runs the sensitivity
sweep's trial loop on CPU, baseline vs patched, same seeds.

If the floor is identical the kernel ships coarse-only; if it drops, the
refine is mandatory and its budget is known (~0.01 ms/win).

Run: python tools/_scan_norefine_floor.py [--trials 20]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, scan
from msk144cudecoder_tpu.protocol import msg77

_N = C.WINDOW_LEN


def select_candidates_coarse(xb, num_cand=C.NUM_CANDIDATES_PER_PATTERN,
                             dec=2):
    """Coarse protocol: per-slice argmax over every dec-th lag, no refine."""
    P, _, F = xb.shape
    pad = jnp.concatenate([xb, xb[:, : C.SCAN_PAD_LEN - _N, :]], axis=1)
    sl = pad.reshape(P, C.NUM_SCAN_SLICES, C.SCAN_SLICE, F)
    coarse = sl[:, :, ::dec, :]  # (P, 21, 256/dec, F)
    slice_max = coarse.max(axis=2)
    slice_arg = dec * coarse.argmax(axis=2).astype(jnp.int32)
    sm = slice_max.transpose(2, 0, 1)
    sa = slice_arg.transpose(2, 0, 1)
    top_xb, top_slice = jax.lax.top_k(sm, num_cand)
    pos = (top_slice * C.SCAN_SLICE
           + jnp.take_along_axis(sa, top_slice, axis=-1)) % _N
    return pos.astype(jnp.int32), top_xb


def run_sweep(cfg, snrs, trials, message="CQ K1ABC FN42"):
    hits = {}
    for snr in snrs:
        n = 0
        for t in range(trials):
            rng = np.random.default_rng(1000 + t)
            audio = G.synthesize_audio_int16([(message, 1500.0)], 6,
                                             snr_db=snr, rng=rng)
            res = pipeline.decode_raw(audio[None, :], cfg)
            h = msg77.CallsignHashTable()
            ok = False
            for k in np.nonzero(np.asarray(res.found[0]))[0]:
                got, text = msg77.unpack77(
                    pipeline.unpack_message_bits(res.message_bits[0][k]), h)
                if got and text == message:
                    ok = True
                    break
            n += ok
        hits[snr] = n
        print(f"  {snr:+.0f} dB: {n}/{trials}", flush=True)
    return hits


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--snrs", type=str, default="-4,-6,-8")
    p.add_argument("--dec", type=int, default=2)
    args = p.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]

    cfg = DecoderConfig(search_width=100.0, search_step=2.0, scan_depth=6,
                        max_survivors=256, nbadsync_threshold=3)

    print("baseline (full-resolution select):", flush=True)
    base = run_sweep(cfg, snrs, args.trials)

    orig = scan.select_candidates
    scan.select_candidates = lambda xb, num_cand=8: select_candidates_coarse(
        xb, num_cand, args.dec)
    pipeline.decode_raw.clear_cache()
    try:
        print(f"coarse dec={args.dec}, NO refine:", flush=True)
        coarse = run_sweep(cfg, snrs, args.trials)
    finally:
        scan.select_candidates = orig
        pipeline.decode_raw.clear_cache()

    same = all(base[s] == coarse[s] for s in snrs)
    print(f"floor identical: {same}")
    for s in snrs:
        print(f"  {s:+.0f} dB: base {base[s]} vs coarse {coarse[s]}")


if __name__ == "__main__":
    main()
