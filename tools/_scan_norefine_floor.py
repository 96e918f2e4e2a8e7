"""Does coarse scan decimation WITHOUT odd-lag refine move the decode
floor? (dev probe; the committed evidence behind config.scan_decimation)

Round-5 history: the original experiment monkeypatched
ops.scan.select_candidates with a coarse selector to test the protocol
BEFORE the feature existed. Now that `scan_decimation` is a config knob
the probe simply runs the real pipeline at dec=1 (the full-resolution
reference grid) vs dec=N, same seeds — comparing exactly what ships.

If the floors are identical the kernel ships coarse-only (no ±1 refine);
measured on-chip at the deep-scan protocol the dec>1 floors are strict
SUPERSETS at -8 dB (see config.py scan_decimation).

Run: python tools/_scan_norefine_floor.py [--trials 20] [--dec 4]
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, ".")
import jax

jax.config.update("jax_platforms", "cpu")

from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline
from msk144cudecoder_tpu.protocol import msg77


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
    p.add_argument("--dec", type=int, default=4)
    args = p.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]

    base_kw = dict(search_width=100.0, search_step=2.0, scan_depth=6,
                   max_survivors=256, nbadsync_threshold=3)

    print("baseline (scan_decimation=1, full-resolution grid):", flush=True)
    base = run_sweep(DecoderConfig(scan_decimation=1, **base_kw),
                     snrs, args.trials)

    print(f"coarse (scan_decimation={args.dec}, NO refine):", flush=True)
    coarse = run_sweep(DecoderConfig(scan_decimation=args.dec, **base_kw),
                       snrs, args.trials)

    same = all(base[s] == coarse[s] for s in snrs)
    print(f"floor identical: {same}")
    for s in snrs:
        print(f"  {s:+.0f} dB: base {base[s]} vs coarse {coarse[s]}")


if __name__ == "__main__":
    main()
