"""Probe for the busy-band test design: staggered-ping stream, survivor
counts, per-message decode (num_avg, nbadsync) across configs."""
from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import time

import numpy as np

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.runtime import StreamDecoder

PINGS = [  # (text, f0, snr_db, start_frame, num_frames)
    ("CQ K1ABC FN42", 1420.0, 7.0, 0, 5),
    ("K1ABC W9XYZ EN37", 1560.0, 3.0, 4, 5),
    ("W9XYZ K1ABC R-03", 1470.0, 1.0, 8, 5),
    ("CQ N0XYZ DM79", 1580.0, 5.0, 12, 5),
]
N_FRAMES = 21


def staggered_audio() -> np.ndarray:
    rng = np.random.default_rng(101)
    n = N_FRAMES * C.FRAME_LEN
    sig = np.zeros(n, dtype=np.complex128)
    t = np.arange(n)
    for text, f0, snr, s, L in PINGS:
        bb = np.tile(G.modulate_frame(G.frame_bits_from_message(text)), L)
        amp = np.sqrt(2.0 * 10 ** (snr / 10.0))
        lo = s * C.FRAME_LEN
        hi = lo + L * C.FRAME_LEN
        sig[lo:hi] += amp * bb * np.exp(2j * np.pi * f0 * t[lo:hi] / C.SAMPLE_RATE)
    noise_sigma = np.sqrt(0.5 * (C.SAMPLE_RATE / 2) / 2500.0) * np.sqrt(2.0)
    sig += noise_sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    audio = sig.real * 1000.0
    return np.clip(np.round(audio), -32768, 32767).astype(np.int16)


def run(cfg: DecoderConfig, audio: np.ndarray):
    from msk144cudecoder_tpu.ops import pipeline

    dec = StreamDecoder(cfg)
    out = {}
    max_surv = 0
    for w0 in range(0, len(audio) - C.WINDOW_LEN + 1, C.HOP_LEN):
        win = audio[w0:w0 + C.WINDOW_LEN]
        res = pipeline.decode_raw(win[None, :], cfg)
        ns = int(np.asarray(res.num_survivors)[0])
        max_surv = max(max_surv, ns)
        items = dec.decode_block(win)
        for r in items:
            k = (r.num_avg, r.nbadsync)
            if r.message not in out or k < out[r.message][:2]:
                out[r.message] = (r.num_avg, r.nbadsync, r.f0, w0 // C.HOP_LEN)
    return out, max_surv


if __name__ == "__main__":
    audio = staggered_audio()
    base = dict(search_width=200.0, search_step=2.0, scan_depth=6,
                nbadsync_threshold=3)
    ncells = DecoderConfig(**base).num_candidates
    print("cells:", ncells)
    for name, cfg in [
        ("unconstrained", DecoderConfig(max_survivors=ncells, survivor_prefilter=0, **base)),
        ("overload-K128", DecoderConfig(max_survivors=128, survivor_prefilter=0, **base)),
        ("overload-K256", DecoderConfig(max_survivors=256, survivor_prefilter=0, **base)),
        ("overload-K512", DecoderConfig(max_survivors=512, survivor_prefilter=0, **base)),
        ("K512-pf1024", DecoderConfig(max_survivors=512, survivor_prefilter=1024, **base)),
        ("K1024-pf2048", DecoderConfig(max_survivors=1024, survivor_prefilter=2048, **base)),
        ("K1024-pf0", DecoderConfig(max_survivors=1024, survivor_prefilter=0, **base)),
    ]:
        t0 = time.time()
        out, ms = run(cfg, audio)
        print(f"{name} ({time.time()-t0:.1f}s) max_surv={ms}")
        for m, v in sorted(out.items()):
            print("  ", m, v)
