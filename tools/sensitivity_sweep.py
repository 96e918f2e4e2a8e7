"""Decode-sensitivity sweep: decode probability vs SNR, JAX pipeline vs the
float64 golden model.

The reference's sensitivity floor comes from 6-frame coherent averaging
(README.md:6); this sweep validates that the TPU pipeline tracks the golden
model's floor within a fraction of a dB — the decode-parity criterion of
BASELINE.md expressed statistically (per-trial bit-exactness is meaningless
at the noise floor where single-sample rounding flips decodes).

Usage: python tools/sensitivity_sweep.py [--trials 20] [--platform cpu]
Writes a summary table to stdout.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--trials", type=int, default=20)
    p.add_argument("--snrs", type=str, default="2,0,-2,-4,-6")
    p.add_argument("--platform", type=str, default=None)
    p.add_argument("--scan-depth", type=int, default=6)
    p.add_argument("--candidates-per-pattern", type=int, default=8)
    p.add_argument("--search-width", type=float, default=100.0)
    p.add_argument("--search-step", type=float, default=2.0)
    p.add_argument("--max-survivors", type=int, default=256)
    p.add_argument("--survivor-prefilter", type=int, default=None)
    p.add_argument("--nbadsync-threshold", type=int, default=1)
    p.add_argument("--scan-decimation", type=int, default=None,
                   help="override config.scan_decimation (1/2/4)")
    p.add_argument("--exact", action="store_true")
    p.add_argument("--golden", action="store_true", help="also run the golden model")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from msk144cudecoder_tpu import golden as G
    from msk144cudecoder_tpu.config import DecoderConfig
    from msk144cudecoder_tpu.ops import pipeline
    from msk144cudecoder_tpu.protocol import msg77
    from msk144cudecoder_tpu.runtime.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    cfg = DecoderConfig(search_width=args.search_width,
                        search_step=args.search_step,
                        scan_depth=args.scan_depth,
                        max_survivors=args.max_survivors,
                        survivor_prefilter=args.survivor_prefilter,
                        nbadsync_threshold=args.nbadsync_threshold,
                        candidates_per_pattern=args.candidates_per_pattern,
                        fast_math=not args.exact,
                        **({} if args.scan_decimation is None
                           else {"scan_decimation": args.scan_decimation}))
    message = "CQ K1ABC FN42"
    snrs = [float(s) for s in args.snrs.split(",")]

    print(f"message={message!r} depth={cfg.scan_depth} "
          f"k'={cfg.candidates_per_pattern} F={cfg.num_freqs} "
          f"K={cfg.max_survivors} pre={cfg.survivor_prefilter} "
          f"trials={args.trials}")
    print(f"{'SNR dB':>7} | {'jax decode %':>12} | {'golden decode %':>15}")
    for snr in snrs:
        jax_hits = 0
        gold_hits = 0
        for t in range(args.trials):
            rng = np.random.default_rng(1000 + t)
            audio = G.synthesize_audio_int16([(message, 1500.0)], 6, snr_db=snr, rng=rng)
            res = pipeline.decode_raw(audio[None, :], cfg)
            h = msg77.CallsignHashTable()
            ok = False
            for k in np.nonzero(np.asarray(res.found[0]))[0]:
                got, text = msg77.unpack77(
                    pipeline.unpack_message_bits(res.message_bits[0][k]), h)
                if got and text == message:
                    ok = True
                    break
            jax_hits += ok
            if args.golden:
                cdat = G.analytic_method2(G.rms_normalize_int16(audio))
                golds = G.decode_window(cdat, cfg.freqs, cfg.scan_depth,
                                        cfg.nbadsync_threshold)
                gold_hits += any(g.text == message for g in golds)
        gcol = f"{100.0 * gold_hits / args.trials:14.0f}%" if args.golden else "      (skipped)"
        print(f"{snr:7.1f} | {100.0 * jax_hits / args.trials:11.0f}% | {gcol}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
