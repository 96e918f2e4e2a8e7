"""Measure the REAL CLI shell's throughput on TPU (VERDICT r3 Weak #2).

bench.py measures the jitted pipeline with device-resident input; this tool
drives the actual product surface — `python -m msk144cudecoder_tpu` reading
16-bit samples on stdin — at the deep-scan config in pipelined throughput
mode (--window-batch --pipeline-depth), on a synthesized stream with planted
messages, and records the CLI's steady-state throughput line.

Pass criterion: CLI-driven rtf >= 0.8x the committed bench headline
(BENCH_r03: 1026x -> floor 820x), per the round-3 verdict's "Done" bar.

Run: python tools/check_cli_tpu.py [--windows N]   (needs the real TPU)
Committed output: tests/data/cli_throughput_tpu.json
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, ".")

from msk144cudecoder_tpu import constants as C  # noqa: E402


def build_stream(n_windows: int, msg_every: int = 512) -> tuple[bytes, int]:
    """Noise stream of n_windows (50%-overlap framing) with a full 6-frame
    MSK144 transmission planted at every msg_every-th window start. Returns
    (raw bytes, number of planted messages)."""
    import jax

    jax.config.update("jax_platforms", "cpu")  # synthesis is host-side numpy
    from msk144cudecoder_tpu import golden as G

    rng = np.random.default_rng(42)
    total = (n_windows - 1) * C.HOP_LEN + C.WINDOW_LEN
    stream = rng.normal(0.0, 1000.0, total).astype(np.int16)
    msg = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6,
                                   snr_db=4.0, rng=rng)
    n_msgs = 0
    for w in range(0, n_windows, msg_every):
        start = w * C.HOP_LEN
        if start + len(msg) <= total:
            stream[start:start + len(msg)] = msg
            n_msgs += 1
    return stream.tobytes(), n_msgs


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--windows", type=int, default=16384)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--depth", type=int, default=4)
    p.add_argument("--floor-rtf", type=float, default=820.0,
                   help="pass floor: 0.8x the bench headline")
    args = p.parse_args()

    raw, n_msgs = build_stream(args.windows)
    print(f"stimulus: {args.windows} windows, {len(raw)/1e6:.1f} MB, "
          f"{n_msgs} planted messages", flush=True)

    cmd = [sys.executable, "-m", "msk144cudecoder_tpu",
           "--search-step=1", "--search-width=500", "--scan-depth=6",
           "--nbadsync-threshold=3",
           f"--window-batch={args.batch}", f"--pipeline-depth={args.depth}"]
    with tempfile.NamedTemporaryFile(suffix=".raw") as f:
        f.write(raw)
        f.flush()
        t0 = time.perf_counter()
        with open(f.name, "rb") as stdin:
            proc = subprocess.run(cmd, stdin=stdin, capture_output=True,
                                  text=True, timeout=3600)
    wall = time.perf_counter() - t0
    sys.stderr.write(proc.stderr)
    assert proc.returncode == 0, f"CLI exited {proc.returncode}"

    decodes = [ln for ln in proc.stdout.splitlines() if ln.startswith("***")]
    n_decoded = sum("CQ K1ABC FN42" in ln for ln in decodes)
    print(f"decode lines: {len(decodes)} ({n_decoded} of the planted message)",
          flush=True)
    assert n_decoded >= n_msgs, (
        f"planted messages lost: {n_decoded}/{n_msgs} decoded")

    m = re.search(r"Throughput: (\d+) windows in ([\d.]+) s = ([\d.]+) "
                  r"ms/window \(([\d,.]+)x real time", proc.stderr)
    assert m, "CLI did not print its steady-state throughput line"
    rtf = float(m.group(4).replace(",", ""))
    ms_per = float(m.group(3))
    print(f"CLI steady-state: {ms_per} ms/window = {rtf}x real time "
          f"(total wall incl. compile: {wall:.1f} s)", flush=True)
    assert rtf >= args.floor_rtf, (
        f"CLI throughput {rtf}x below the {args.floor_rtf}x floor")

    report = {
        "cmd": " ".join(cmd[2:]),
        "windows": args.windows,
        "planted_messages": n_msgs,
        "decoded_planted": n_decoded,
        "steady_state_ms_per_window": ms_per,
        "steady_state_rtf": rtf,
        "total_wall_s": round(wall, 1),
        "floor_rtf": args.floor_rtf,
        "ok": True,
    }
    with open("tests/data/cli_throughput_tpu.json", "w") as f:
        json.dump(report, f, indent=1)
    print("OK — wrote tests/data/cli_throughput_tpu.json", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
