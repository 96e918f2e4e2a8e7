"""Golden-model tests: encoder/decoder self-consistency at descending SNR."""

import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.protocol import crc, ldpc_tables


def test_modulated_frame_is_constant_envelope():
    frame = G.frame_bits_from_message("K1ABC W9XYZ EN37")
    bb = G.modulate_frame(frame)
    assert bb.shape == (864,)
    mag = np.abs(bb)
    assert np.allclose(mag, 1.0, atol=1e-9)


def test_sync_template_matches_modulated_sync():
    """cb42 must equal the modulated waveform over the first sync region."""
    frame_bits = np.zeros(144, dtype=np.uint8)
    frame_bits[0:8] = C.SYNC_WORD
    frame_bits[56:64] = C.SYNC_WORD
    bb = G.modulate_frame(frame_bits)
    # Over samples [0,42) only sync pulses contribute on their rails; data
    # bits are 0 (-1) but we compare correlation peak location instead:
    xb = np.abs(
        sum(np.roll(np.conj(bb + np.roll(bb, -336)), -i) * C.CB42[i] for i in range(42))
    )
    assert xb.argmax() == 0


def test_scan_finds_frame_alignment():
    audio = G.synthesize_audio_int16([("K1ABC W9XYZ EN37", 1500.0)], 6, snr_db=12.0,
                                     rng=np.random.default_rng(1))
    cdat = G.analytic_method2(G.rms_normalize_int16(audio))
    freqs = np.array([1500.0])
    cands = G.scan_candidates(cdat, freqs, scan_depth=1)
    best = max(cands, key=lambda c: c.xb)
    assert best.pos % 864 == 0


def test_decode_audio_method2():
    audio = G.synthesize_audio_int16([("K1ABC W9XYZ EN37", 1502.0)], 6, snr_db=8.0,
                                     rng=np.random.default_rng(2))
    cdat = G.analytic_method2(G.rms_normalize_int16(audio))
    freqs = C.freq_grid(1500.0, 20.0, 2.0)
    res = G.decode_window(cdat, freqs, scan_depth=1, nbadsync_threshold=1)
    assert any(r.text == "K1ABC W9XYZ EN37" for r in res)


def test_decode_audio_method1():
    audio = G.synthesize_audio_int16([("CQ RA9YER MO65", 1500.0)], 6, snr_db=8.0,
                                     rng=np.random.default_rng(3))
    cdat = G.analytic_method1(G.rms_normalize_int16(audio))
    freqs = C.freq_grid(1500.0, 8.0, 2.0)
    res = G.decode_window(cdat, freqs, scan_depth=1, nbadsync_threshold=1)
    assert any(r.text == "CQ RA9YER MO65" for r in res)


def test_decode_iq_mode():
    iq = G.synthesize_iq_int8([("K1ABC W9XYZ RR73", 0.0)], 6, snr_db=8.0,
                              rng=np.random.default_rng(4))
    z = (iq[0::2].astype(np.float64) + 1j * iq[1::2].astype(np.float64)) / 128.0
    cdat = G.iq_filter(z)
    freqs = C.freq_grid(0.0, 8.0, 2.0)
    res = G.decode_window(cdat, freqs, scan_depth=1, nbadsync_threshold=1)
    assert any(r.text == "K1ABC W9XYZ RR73" for r in res)


def test_averaging_digs_out_weak_signal():
    """A signal too weak for single-frame decode is recovered by 6-frame
    coherent averaging (the scan-depth mechanism, README.md:6 claim)."""
    rng = np.random.default_rng(5)
    audio = G.synthesize_audio_int16([("K1ABC W9XYZ 73", 1500.0)], 6, snr_db=-2.0, rng=rng)
    cdat = G.analytic_method2(G.rms_normalize_int16(audio))
    freqs = np.array([1500.0])

    def texts(depth):
        res = G.decode_window(cdat, freqs, scan_depth=depth, nbadsync_threshold=2)
        return {(r.text, r.candidate.pattern_idx) for r in res}

    shallow = texts(1)
    assert not any(t == "K1ABC W9XYZ 73" for t, _ in shallow)
    deep = texts(6)
    # the successful decode must come from a multi-frame averaging pattern
    assert any(t == "K1ABC W9XYZ 73" and p >= 1 for t, p in deep)


def test_bp_corrects_flipped_bits():
    rng = np.random.default_rng(6)
    bits77 = rng.integers(0, 2, 77).astype(np.uint8)
    bits77[71:77] = 0  # free text type => plausible
    cw = ldpc_tables.encode(crc.attach_crc(bits77))
    llr = (2.0 * cw - 1.0) * 4.0
    llr[[5, 40, 77, 100]] *= -1.0  # flip 4 bits
    found, decoded, iters, nerr = G.bp_decode(llr)
    assert found
    assert (decoded == cw).all()
    assert nerr == 4


def test_bp_rejects_noise():
    rng = np.random.default_rng(7)
    for _ in range(3):
        llr = rng.standard_normal(128) * 3.0
        found, *_ = G.bp_decode(llr)
        assert not found
