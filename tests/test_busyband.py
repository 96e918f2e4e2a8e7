"""Busy-band / survivor-overflow validation (round-3 VERDICT item 3).

The reference BP-decodes EVERY under-threshold survivor, sizing the LDPC
grid dynamically (/root/reference/src/index_kernel.cuh:22-75, launch at
/root/reference/src/main.cu:466-467), and its host filter prints the
lowest-num_avg decode per message (/root/reference/src/result_filter.cpp:59-72).
This repo replaces the dynamic compaction with a static top-K batch,
per-pattern slot quotas, and an optional xb prefilter. These tests construct
the adversarial conditions those mechanisms exist for — a meteor-shower
pileup of four staggered pings at mixed SNR/frequency, every consecutive
pair overlapping in time, with thousands of under-threshold survivors per
window — and assert the decode behavior the reference's dynamic path would
produce:

  (a) decode parity with the xb prefilter on vs off — STRICT per-message
      (num_avg, nbadsync) parity at full per-cell depth (prefilter_per_cell=8
      keeps all 8 scan lags per (freq, pattern) cell, the same cap the
      reference itself has, common.h:34), plus decode-SET parity at the
      shipping per_cell=2 default (a partial-window ping can have its
      highest-xb lag land on a frame jammed by the next ping — sync intact,
      data bits corrupt — so a cell-top-2 cap may keep only undecodable lags
      of a cell; the decode then surfaces from a deeper pattern),
  (b) per-message parity native (bf16/f32) vs exact precision,
  (c) the overflow warning fires when survivors exceed the static batch,
  (d) per-pattern quotas do not starve the lowest-num_avg decode the
      reference would print: under a >13x overload every message still
      decodes with the same (num_avg, nbadsync) as the unconstrained run.

The stimulus: 21 frames of stream, pings of 5 frames starting at frames
0/4/8/12 — so frames 4, 8 and 12 each carry two simultaneous transmissions,
and each ping also gets window-front frames in some 3-frame-hop window
(where its num_avg=1 pattern-0 decode comes from). SNRs 7/3/1/5 dB put the
weakest ping 6 dB under its strongest time-neighbor.

tools/run_hwtests.py re-runs this battery against the fused Pallas kernels
on real TPU hardware (this file exercises the jnp path on CPU).
"""

from __future__ import annotations

import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.runtime import StreamDecoder

PINGS = [  # (text, f0_hz, snr_db, start_frame, num_frames)
    ("CQ K1ABC FN42", 1420.0, 7.0, 0, 5),
    ("K1ABC W9XYZ EN37", 1560.0, 3.0, 4, 5),
    ("W9XYZ K1ABC R-03", 1470.0, 1.0, 8, 5),
    ("CQ N0XYZ DM79", 1580.0, 5.0, 12, 5),
]
N_FRAMES = 21

BASE = dict(search_width=200.0, search_step=2.0, scan_depth=6,
            nbadsync_threshold=3)
NCELLS = DecoderConfig(**BASE).num_candidates  # 4848: every scan candidate


def staggered_pileup_audio() -> np.ndarray:
    """16-bit audio of the four staggered pings over one noise floor (the
    golden synthesizer applies one SNR and one time span to all messages,
    so place each ping by hand with the same amplitude convention,
    golden/model.py synthesize_baseband)."""
    rng = np.random.default_rng(101)
    n = N_FRAMES * C.FRAME_LEN
    sig = np.zeros(n, dtype=np.complex128)
    t = np.arange(n)
    for text, f0, snr, s, L in PINGS:
        bb = np.tile(G.modulate_frame(G.frame_bits_from_message(text)), L)
        amp = np.sqrt(2.0 * 10 ** (snr / 10.0))
        lo, hi = s * C.FRAME_LEN, (s + L) * C.FRAME_LEN
        sig[lo:hi] += amp * bb * np.exp(
            2j * np.pi * f0 * t[lo:hi] / C.SAMPLE_RATE)
    noise_sigma = np.sqrt(0.5 * (C.SAMPLE_RATE / 2) / 2500.0) * np.sqrt(2.0)
    sig += noise_sigma * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    return np.clip(np.round(sig.real * 1000.0), -32768, 32767).astype(np.int16)


def stream_windows(audio: np.ndarray) -> np.ndarray:
    """(B, WINDOW_LEN) batch of the stream's 50%-overlap windows."""
    starts = range(0, len(audio) - C.WINDOW_LEN + 1, C.HOP_LEN)
    return np.stack([audio[s:s + C.WINDOW_LEN] for s in starts])


def decode_stream(cfg: DecoderConfig, windows: np.ndarray):
    """Run the stream through StreamDecoder; return (best, max_survivors)
    where best maps message -> its lowest (num_avg, nbadsync) over the
    stream — the reference prints the lowest num_avg per message per block
    (result_filter.cpp:59-72); across blocks we keep the stream-wide best —
    plus the decode frequency."""
    dec = StreamDecoder(cfg)
    res = dec.decode_to_host(windows)
    best: dict = {}
    for items in dec.postprocess_batch(res, len(windows)):
        for r in items:
            k = (r.num_avg, r.nbadsync)
            if r.message not in best or k < best[r.message][:2]:
                best[r.message] = (r.num_avg, r.nbadsync, r.f0)
    return best, int(np.asarray(res.num_survivors).max())


@pytest.fixture(scope="module")
def windows():
    return stream_windows(staggered_pileup_audio())


@pytest.fixture(scope="module")
def full_run(windows):
    """Unconstrained run: prefilter off, K = the whole candidate grid —
    the exact static analog of the reference's decode-everything LDPC
    grid (main.cu:466-467)."""
    cfg = DecoderConfig(max_survivors=NCELLS, survivor_prefilter=0, **BASE)
    return decode_stream(cfg, windows)


class TestBusyBand:
    def test_all_four_messages_decode(self, full_run):
        best, _ = full_run
        assert set(best) == {m for m, _, _, _, _ in PINGS}

    def test_lowest_num_avg_printed(self, full_run):
        # every ping has a clean window-front frame, so the filter must
        # report a single-frame (num_avg=1) clean-sync decode for each
        best, _ = full_run
        for text, (num_avg, nbadsync, _) in best.items():
            assert (num_avg, nbadsync) == (1, 0), (text, num_avg, nbadsync)

    def test_frequencies_match_plants(self, full_run):
        best, _ = full_run
        for text, f0, _, _, _ in PINGS:
            assert abs(best[text][2] - f0) <= BASE["search_step"], (
                text, best[text][2], f0)

    def test_band_is_genuinely_overloaded(self, full_run):
        # thousands of under-threshold survivors: > 13x the K=256 overload
        # batch below, and > the shipping K=512 default too
        _, max_surv = full_run
        assert max_surv > 3000, max_surv

    def test_prefilter_strict_parity_full_cell_depth(self, windows, full_run):
        """(a) strict: prefilter at full per-cell depth (8 = the reference's
        own per-cell candidate cap) + 2x-K headroom must reproduce every
        per-message (num_avg, nbadsync)."""
        cfg = DecoderConfig(max_survivors=1024, survivor_prefilter=2048,
                            prefilter_per_cell=8, **BASE)
        best, _ = decode_stream(cfg, windows)
        assert best == full_run[0]

    def test_prefilter_shipping_default_decode_set(self, windows, full_run):
        """(a) shipping default (per_cell=2, pf=2xK): the decode SET must
        survive. num_avg may legitimately differ — see module docstring —
        but nothing may be lost or hallucinated."""
        cfg = DecoderConfig(max_survivors=512, survivor_prefilter=1024,
                            **BASE)
        best, _ = decode_stream(cfg, windows)
        assert set(best) == set(full_run[0])

    def test_exact_vs_native_parity(self, windows, full_run):
        """(b) precision mode must not change any per-message decode (the
        busy-band analog of the single-signal sensitivity-floor equivalence;
        tools/run_hwtests.py repeats this against the fused TPU kernels)."""
        cfg = DecoderConfig(max_survivors=NCELLS, survivor_prefilter=0,
                            fast_math=False, **BASE)
        best, _ = decode_stream(cfg, windows)
        assert best == full_run[0]

    def test_overflow_warning_and_no_starvation(self, windows, full_run,
                                                capsys):
        """(c)+(d) K=256 against >3400 genuine survivors: the warning must
        fire, and the per-pattern quotas must keep every message's
        lowest-num_avg decode alive (a single global (nbadsync, xb) ranking
        would flood the batch with high-num_avg candidates — xb grows with
        coherent averaging — and starve the pattern-0 rows the reference
        prints)."""
        cfg = DecoderConfig(max_survivors=256, survivor_prefilter=0, **BASE)
        best, max_surv = decode_stream(cfg, windows)
        err = capsys.readouterr().err
        assert "survivors exceed the LDPC batch" in err
        assert max_surv > cfg.max_survivors
        # the parity contract is per-message (num_avg, nbadsync): the
        # constrained batch must lose no decode and no averaging tier. f0
        # may legitimately land one grid step off (adjacent channels decode
        # the same ping with equal metrics; which duplicate survives dedup
        # is roster-order-sensitive, e.g. under scan decimation).
        assert set(best) == set(full_run[0])
        for m, (num_avg, nbad, f0) in full_run[0].items():
            assert best[m][:2] == (num_avg, nbad), (m, best[m])
            assert abs(best[m][2] - f0) <= BASE["search_step"], (m, best[m])

    def test_overflow_warning_fires_with_prefilter_on(self, windows,
                                                      full_run, capsys):
        """The SHIPPING path keeps a prefilter active, which makes
        num_survivors a lower bound (only prefiltered candidates are
        demodulated, and nbadsync exists only post-demod — exactness would
        require the full demod the prefilter exists to avoid). The warning
        must still fire under genuine overload, flag the bound as 'at
        least', and the decode set must still match the unconstrained
        oracle per message."""
        cfg = DecoderConfig(max_survivors=512, survivor_prefilter=1024,
                            **BASE)
        best, max_surv = decode_stream(cfg, windows)
        err = capsys.readouterr().err
        assert "sync survivors exceed the LDPC batch" in err
        assert "at least" in err
        assert max_surv > cfg.max_survivors
        # decode-SET contract under the prefilter (same as
        # test_prefilter_shipping_default_decode_set: num_avg may
        # legitimately differ under per_cell=2, nothing lost/hallucinated)
        assert set(best) == set(full_run[0])
        for m in full_run[0]:
            assert best[m][1] == 0, (m, best[m])  # clean sync decode
