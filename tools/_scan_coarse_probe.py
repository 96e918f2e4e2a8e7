"""Round-5 groundwork probe: coarse-to-fine lag scan candidate parity.

The K=256 default makes the scan the dominant pipeline term, and its
correlation matmuls are MXU-bound with a 42-deep contraction (1/3 systolic
utilization) — see ARCHITECTURE "stage split". The algorithmic lever is a
2:1 decimated scan: correlate EVEN lags only (half the matmul rows), take
each 256-lag slice's coarse max, then refine among {coarse-1, coarse,
coarse+1}. This probe quantifies, on CPU with the jnp scan pieces, how
faithfully that reproduces the full scan's candidates and (decisively)
whether any DECODABLE candidate is lost across seeds and SNRs.

Run: python tools/_scan_coarse_probe.py

Measured (24 trials, seeds x SNRs down to -6 dB, width 200/depth 6):
  dec=2: pos-agree 0.977, per-cell set-match 0.953, planted best 24/24
  dec=4: pos-agree 0.912, per-cell set-match 0.919, planted best 24/24

Kernel design note for the implementer: the refine step needs the metric
at per-(pattern, slice, freq) scattered odd lags, whose G values the
coarse pass never computes. XLA gathers are scalar-core death (the
round-1 lesson), and a dense one-hot over all N lags is 27 GFLOP — but
the survivor-demod kernel already solved this exact shape: per-cell
one-hot extraction off 96-row OFFSET-CLASS sliding matrices
(ops/pallas_survivor.py). The refine is ~252 extractions per F-tile of a
42-tap row + a lane dot — the same machinery at smaller scale.
"""
from __future__ import annotations

import sys

sys.path.insert(0, ".")
import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.ops import scan
from msk144cudecoder_tpu.ops.pipeline import preprocess
from msk144cudecoder_tpu.config import DecoderConfig

_N = C.WINDOW_LEN


def coarse_refine_candidates(xb: jnp.ndarray, num_cand: int = 8,
                             dec: int = 2):
    """xb (P, N, F) full metric field -> candidates via the dec:1 protocol:
    slice maxima computed on every dec-th lag, winner refined among
    {coarse-(dec-1) .. coarse+(dec-1)}. Uses the full field for the refine
    values (the kernel would compute exactly those columns)."""
    P, N, F = xb.shape
    pad = jnp.concatenate([xb, xb[:, : C.SCAN_PAD_LEN - _N, :]], axis=1)
    sl = pad.reshape(P, C.NUM_SCAN_SLICES, C.SCAN_SLICE, F)
    coarse = sl[:, :, ::dec, :]  # decimated lags within each slice
    ca = dec * coarse.argmax(axis=2).astype(jnp.int32)  # slice-local
    base = jnp.arange(C.NUM_SCAN_SLICES, dtype=jnp.int32)[None, :, None] * C.SCAN_SLICE
    lag = base + ca  # global coarse winner lag
    padN = pad.shape[1]

    def at(off):
        li = jnp.clip(lag + off, 0, padN - 1)
        return jnp.take_along_axis(
            pad, li[:, :, None].reshape(P, -1, F)[:, :, :], axis=1
        ).reshape(P, C.NUM_SCAN_SLICES, F), li

    offs = list(range(-(dec - 1), dec))
    pairs = [at(o) for o in offs]
    vals = jnp.stack([v for v, _ in pairs], axis=2)  # (P, 21, n_off, F)
    lags = jnp.stack([l for _, l in pairs], axis=2)
    w = vals.argmax(axis=2)
    slice_max = jnp.take_along_axis(vals, w[:, :, None, :], axis=2)[:, :, 0, :]
    slice_lag = jnp.take_along_axis(lags, w[:, :, None, :], axis=2)[:, :, 0, :]
    sm = slice_max.transpose(2, 0, 1)  # (F, P, 21)
    sa = slice_lag.transpose(2, 0, 1)
    top_xb, top_slice = jax.lax.top_k(sm, num_cand)
    pos = jnp.take_along_axis(sa, top_slice, axis=-1) % _N
    return pos.astype(jnp.int32), top_xb


def main() -> int:
    global DEC
    cfg = DecoderConfig(search_step=2.0, search_width=200.0, scan_depth=6,
                        nbadsync_threshold=3)
    freqs = tuple(float(f) for f in cfg.freqs)
    P = cfg.scan_depth
    n_trials, pos_same, set_same, xb_close = 0, 0, 0, 0
    planted_kept = planted_total = 0
    for seed in range(6):
        for snr in (10.0, 2.0, -2.0, -6.0):
            rng = np.random.default_rng(seed)
            a = G.synthesize_audio_int16(
                [("CQ K1ABC FN42", 1500.0 + 7 * seed - 20)], 6,
                snr_db=snr, rng=rng)
            c = preprocess(a[None, :], cfg)[0]
            Gf = scan.sync_correlation(c, freqs)
            xb = scan.pattern_metrics(Gf, P)
            pos_f, xb_f = scan.select_candidates(xb)
            pos_c, xb_c = coarse_refine_candidates(xb, dec=DEC)
            pf, pc = np.asarray(pos_f), np.asarray(pos_c)
            xf, xc = np.asarray(xb_f), np.asarray(xb_c)
            n_trials += 1
            pos_same += (pf == pc).mean()
            set_same += np.mean([
                len(set(pf[f, p]) & set(pc[f, p])) / pf.shape[2]
                for f in range(pf.shape[0]) for p in range(P)])
            xb_close += np.mean(np.abs(np.sort(xc, -1) - np.sort(xf, -1))
                                / np.maximum(np.sort(xf, -1), 1e-9) < 5e-3)
            # the decisive question: does the planted signal's BEST full-scan
            # candidate (global argmax) survive coarse+refine bit-exactly?
            k = np.unravel_index(np.argmax(xf), xf.shape)
            planted_total += 1
            planted_kept += int(pf[k] in pc[k[0], k[1]])
    print(f"trials={n_trials}  mean pos-agree={pos_same/n_trials:.4f}  "
          f"mean per-cell set-match={set_same/n_trials:.4f}  "
          f"xb-close={xb_close/n_trials:.4f}")
    print(f"dec={DEC}: best planted candidate survives: "
          f"{planted_kept}/{planted_total}")
    return 0


if __name__ == "__main__":
    for DEC in (2, 4):
        main()
    sys.exit(0)
