"""Benchmark: real-time factor on the reference's deep-scan configuration.

Headline metric (BASELINE.md): real-time factor per chip on the deep scan
(--search-step=1 --search-width=500 --scan-depth=6 --nbadsync-threshold=3,
/root/reference/README.md:65-67). One loop iteration consumes HOP_LEN = 2592
new samples (216 ms of signal, main.cu:283-294); rtf = samples decoded per
wall-second / 12000. vs_baseline is against the 1000x-per-chip north star.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=128, help="windows per device call")
    p.add_argument("--iters", type=int, default=8, help="timed iterations per stream")
    p.add_argument("--streams", type=int, default=4,
                   help="concurrent host threads feeding the chip (the dev "
                        "tunnel serializes each thread's dispatch+fetch round "
                        "trips; three independent chains overlap them and reach "
                        "the device-compute bound, like a pipelined driver; "
                        "measured on v5e at batch 128 native: 3 streams 803x, 4 815x)")
    p.add_argument("--quick", action="store_true",
                   help="small config for CI/CPU smoke runs")
    p.add_argument("--exact", action="store_true",
                   help="exactness-verification precision instead of the "
                        "native policy (bf16 in / f32 accumulate); decode "
                        "behavior identical, ~24%% slower on v5e")
    p.add_argument("--platform", type=str, default=None)
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from msk144cudecoder_tpu import constants as C
    from msk144cudecoder_tpu import golden as G
    from msk144cudecoder_tpu.config import DecoderConfig
    from msk144cudecoder_tpu.ops import pipeline

    if args.quick:
        cfg = DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128,
                            fast_math=not args.exact)
    else:
        cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                            nbadsync_threshold=3, max_survivors=512,
                            fast_math=not args.exact)

    rng = np.random.default_rng(0)
    msg_audio = G.synthesize_audio_int16(
        [("CQ K1ABC FN42", 1500.0)], 6, snr_db=4.0, rng=rng
    )
    noise = rng.normal(0.0, 1000.0, (args.batch - 1, C.WINDOW_LEN)).astype(np.int16)
    raw = np.concatenate([msg_audio[None, :], noise]) if args.batch > 1 else msg_audio[None, :]

    dev = jax.devices()[0]
    print(f"bench: platform={dev.platform} device={dev} cfg: F={cfg.num_freqs} "
          f"P={cfg.scan_depth} K={cfg.max_survivors} batch={args.batch}",
          file=sys.stderr)

    # Device-resident input: the metric is chip throughput (samples/s/chip).
    # On this infra the host<->device link is a network tunnel whose latency
    # would otherwise dominate; a production host feeds the chip locally and
    # overlaps ingest with compute (double-buffered submit/collect).
    raw_dev = jax.device_put(raw, dev)

    t0 = time.perf_counter()
    res = pipeline.decode_raw(raw_dev, cfg)
    jax.block_until_ready(res)
    compile_s = time.perf_counter() - t0
    print(f"bench: first call (compile+run) {compile_s:.1f}s", file=sys.stderr)

    # sanity: the planted message must decode
    assert bool(np.asarray(res.found[0]).any()), "bench stimulus failed to decode"

    # Every iteration's (compacted) found flags are fetched to the host — a
    # bare block_until_ready can report enqueue time rather than execution
    # time on tunneled runtimes, and a real consumer reads results per
    # window. Each dispatch+fetch pair pays this dev tunnel's ~27 ms round
    # trips (a production host does not have them); independent streams from
    # separate host threads overlap them (measured: 2 streams reach the
    # device-compute bound; submit-all-then-collect on one stream does NOT).
    import threading

    raws = [raw_dev] + [jax.device_put(raw, dev)
                        for _ in range(args.streams - 1)]

    def stream_loop(raw_d):
        for _ in range(args.iters):
            r = pipeline.decode_raw(raw_d, cfg)
            np.asarray(r.found)

    for r_ in raws[1:]:  # warm the cache for every stream's buffer
        np.asarray(pipeline.decode_raw(r_, cfg).found)
    t0 = time.perf_counter()
    if args.streams == 1:
        stream_loop(raws[0])
    else:
        ths = [threading.Thread(target=stream_loop, args=(r_,)) for r_ in raws]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
    elapsed = time.perf_counter() - t0

    per_window_s = elapsed / (args.streams * args.iters * args.batch)
    samples_per_s = C.HOP_LEN / per_window_s
    rtf = samples_per_s / C.SAMPLE_RATE
    print(f"bench: {per_window_s*1e3:.2f} ms/window  {samples_per_s:,.0f} samples/s  "
          f"rtf={rtf:,.1f}x", file=sys.stderr)

    # batch-1 latency: the real-time streaming case (one 432 ms window per
    # call, fetch results) must land far inside the 216 ms loop budget
    raw1 = jax.device_put(raw[:1], dev)
    res1 = pipeline.decode_raw(raw1, cfg)
    np.asarray(res1.found)
    lat = []
    for _ in range(max(args.iters, 8)):
        t0 = time.perf_counter()
        res1 = pipeline.decode_raw(raw1, cfg)
        np.asarray(res1.found)
        lat.append(time.perf_counter() - t0)
    latency_b1_ms = min(lat) * 1e3
    print(f"bench: batch-1 latency {latency_b1_ms:.2f} ms/loop "
          f"(budget 210 ms)", file=sys.stderr)

    print(json.dumps({
        "metric": "real_time_factor_deep_scan" if not args.quick else "real_time_factor_quick",
        "value": round(rtf, 2),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 1000.0, 4),
        "latency_b1_ms": round(latency_b1_ms, 2),
        "peak_samples_per_s": round(samples_per_s),
        "batch": args.batch,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
