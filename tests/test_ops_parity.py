"""Stage-level parity: JAX ops vs the float64 NumPy golden model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import analytic, ldpc, pipeline, scan, softbits
from msk144cudecoder_tpu.protocol import crc, ldpc_tables, msg77


@pytest.fixture(scope="module")
def audio():
    return G.synthesize_audio_int16(
        [("K1ABC W9XYZ EN37", 1502.0)], 6, snr_db=6.0, rng=np.random.default_rng(11)
    )


@pytest.fixture(scope="module")
def cdat_np(audio):
    return G.analytic_method2(G.rms_normalize_int16(audio))


class TestAnalytic:
    def test_method2(self, audio):
        want = G.analytic_method2(G.rms_normalize_int16(audio))
        got = analytic.analytic_method2(analytic.rms_normalize(jnp.asarray(audio)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    def test_method1(self, audio):
        want = G.analytic_method1(G.rms_normalize_int16(audio))
        got = analytic.analytic_method1(analytic.rms_normalize(jnp.asarray(audio)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)

    def test_iq_filter(self):
        iq = G.synthesize_iq_int8([("CQ K1ABC FN42", 0.0)], 6, snr_db=10.0,
                                  rng=np.random.default_rng(12))
        z = (iq[0::2].astype(np.float64) + 1j * iq[1::2].astype(np.float64)) / 128.0
        want = G.iq_filter(z)
        got = analytic.iq_filter(jnp.asarray(z.astype(np.complex64)))
        np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)

    def test_batched(self, audio):
        x = jnp.stack([jnp.asarray(audio)] * 3)
        got = analytic.analytic_method2(analytic.rms_normalize(x))
        assert got.shape == (3, C.WINDOW_LEN)


class TestScan:
    def test_sync_correlation_matches_golden_xb(self, cdat_np):
        """G-factorized scan == golden per-(f,p) brute-force correlation."""
        freqs = (1496.0, 1500.0, 1503.0)
        c = jnp.asarray(cdat_np.astype(np.complex64))
        xb = scan.pattern_metrics(scan.sync_correlation(c, freqs), scan_depth=4)
        xb = np.asarray(xb)  # (P, N, F)
        for fi, f0 in enumerate(freqs):
            for p in range(4):
                want = G.scan_xb(cdat_np, f0, p)
                got = xb[p, :, fi]
                np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-3)

    def test_wrap_boundary_lags_exact(self, cdat_np):
        """The final 41 lags exercise the chi wrap-correction path."""
        freqs = (1501.0,)  # non-multiple of fs/N: wrap phase matters
        c = jnp.asarray(cdat_np.astype(np.complex64))
        xb = np.asarray(scan.pattern_metrics(scan.sync_correlation(c, freqs), 1))[0, :, 0]
        want = G.scan_xb(cdat_np, 1501.0, 0)
        np.testing.assert_allclose(xb[-41:], want[-41:], rtol=5e-3, atol=5e-3)

    def test_candidate_selection_matches_golden(self, cdat_np):
        freqs = (1498.0, 1502.0)
        c = jnp.asarray(cdat_np.astype(np.complex64))
        pos, xb = scan.scan(c, freqs, 2)
        golden = G.scan_candidates(cdat_np, np.asarray(freqs), 2)
        for fi in range(2):
            for p in range(2):
                want = sorted(
                    [g.pos for g in golden if g.freq_idx == fi and g.pattern_idx == p]
                )
                got = sorted(np.asarray(pos[fi, p]).tolist())
                assert got == want


class TestSoftbits:
    def test_demod_matches_golden(self, cdat_np):
        freqs = (1500.0, 1502.0)
        c = jnp.asarray(cdat_np.astype(np.complex64))
        pos, _ = scan.scan(c, freqs, 2)
        sb, nbad = softbits.demod_candidates(c, freqs, 2, pos)
        sb, nbad, pos = np.asarray(sb), np.asarray(nbad), np.asarray(pos)
        for fi, f0 in enumerate(freqs):
            for p in range(2):
                for k in range(C.NUM_CANDIDATES_PER_PATTERN):
                    cand = G.Candidate(fi, p, int(pos[fi, p, k]), 0.0, f0,
                                       int(C.PATTERN_NUM_AVG[p]))
                    want_sb, want_nbad = G.demod_softbits(cdat_np, cand)
                    assert nbad[fi, p, k] == want_nbad, (fi, p, k)
                    np.testing.assert_allclose(
                        sb[fi, p, k], want_sb, rtol=2e-3, atol=2e-3 * np.abs(want_sb).max()
                    )


class TestLDPC:
    def _clean_llr(self, seed, nflip=0):
        rng = np.random.default_rng(seed)
        bits77 = rng.integers(0, 2, 77).astype(np.uint8)
        bits77[71:77] = 0
        cw = ldpc_tables.encode(crc.attach_crc(bits77))
        llr = (2.0 * cw.astype(np.float32) - 1.0) * 4.0
        flips = rng.choice(128, size=nflip, replace=False)
        llr[flips] *= -1.0
        return llr, cw

    def test_batch_matches_golden(self):
        llrs, cws, wants = [], [], []
        for seed, nflip in [(0, 0), (1, 3), (2, 6), (3, 10), (4, 25)]:
            llr, cw = self._clean_llr(seed, nflip)
            llrs.append(llr)
            cws.append(cw)
            wants.append(G.bp_decode(llr.astype(np.float64)))
        noise = np.random.default_rng(9).standard_normal((3, 128)).astype(np.float32) * 3
        llr_batch = np.concatenate([np.stack(llrs), noise])
        res = ldpc.bp_decode(jnp.asarray(llr_batch), jnp.ones(8, bool))
        found = np.asarray(res.found)
        for i, (wfound, wcw, wit, wnerr) in enumerate(wants):
            assert found[i] == wfound, i
            if wfound:
                assert (np.asarray(res.codeword[i]) == wcw).all()
                assert int(res.iterations[i]) == wit
                assert int(res.hard_errors[i]) == wnerr
        assert not found[5:].any()  # noise rejected

    def test_invalid_mask_blocks_decode(self):
        llr, _ = self._clean_llr(0, 0)
        res = ldpc.bp_decode(jnp.asarray(llr)[None], jnp.zeros(1, bool))
        assert not bool(res.found[0])

    def test_platanh_matches_reference(self):
        xs = np.linspace(-1.1, 1.1, 777).astype(np.float32)
        got = np.asarray(ldpc.platanh(jnp.asarray(xs)))
        want = np.array([G.platanh(float(x)) for x in xs], dtype=np.float32)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


class TestPipeline:
    def test_end_to_end_decodes_message(self, audio):
        cfg = DecoderConfig(search_width=40.0, scan_depth=2, max_survivors=64)
        res = pipeline.decode_raw(jnp.asarray(audio)[None, :], cfg)
        found = np.asarray(res.found[0])
        assert found.any()
        bits = pipeline.unpack_message_bits(np.asarray(res.message_bits[0])[found][0])
        ok, text = msg77.unpack77(bits)
        assert ok and text == "K1ABC W9XYZ EN37"

    def test_matches_golden_decode_set(self, cdat_np, audio):
        cfg = DecoderConfig(search_width=16.0, scan_depth=2, max_survivors=128)
        res = pipeline.decode_raw(jnp.asarray(audio)[None, :], cfg)
        got_msgs = set()
        found = np.asarray(res.found[0])
        for i in np.where(found)[0]:
            ok, text = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][i]))
            if ok:
                got_msgs.add(text)
        golden = G.decode_window(cdat_np, cfg.freqs, 2, cfg.nbadsync_threshold)
        want_msgs = {g.text for g in golden}
        assert want_msgs == got_msgs

    def test_iq_pipeline(self):
        iq = G.synthesize_iq_int8([("K1ABC W9XYZ RR73", -3.0)], 6, snr_db=8.0,
                                  rng=np.random.default_rng(13))
        cfg = DecoderConfig.create(read_mode=2, search_width=16.0, scan_depth=1,
                                   max_survivors=64)
        res = pipeline.decode_raw(jnp.asarray(iq)[None, :], cfg)
        found = np.asarray(res.found[0])
        assert found.any()
        ok, text = msg77.unpack77(pipeline.unpack_message_bits(np.asarray(res.message_bits[0])[found][0]))
        assert ok and text == "K1ABC W9XYZ RR73"


class TestCandidatesPerPattern:
    """cfg.candidates_per_pattern (k') keeps the best-sync k lags per
    (freq, pattern): scan output must be an exact prefix of the k=8 output
    (candidates are emitted in descending xb order) and decodes must survive
    the cut at practical SNR."""

    def test_scan_prefix_property(self):
        rng = np.random.default_rng(3)
        audio = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6,
                                         snr_db=2.0, rng=rng)
        cfg = DecoderConfig(search_width=60.0, scan_depth=3)
        c = pipeline.preprocess(jnp.asarray(audio)[None, :], cfg)[0]
        freqs = tuple(float(f) for f in cfg.freqs)
        p8, x8 = scan.scan(c, freqs, 3, num_cand=8)
        p2, x2 = scan.scan(c, freqs, 3, num_cand=2)
        assert np.array_equal(np.asarray(p8)[:, :, :2], np.asarray(p2))
        assert np.array_equal(np.asarray(x8)[:, :, :2], np.asarray(x2))

    def test_decode_at_k2(self):
        rng = np.random.default_rng(4)
        audio = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6,
                                         snr_db=2.0, rng=rng)
        cfg = DecoderConfig(search_width=60.0, scan_depth=3, max_survivors=128,
                            candidates_per_pattern=2)
        res = pipeline.decode_raw(jnp.asarray(audio)[None, :], cfg)
        found = np.asarray(res.found[0])
        texts = set()
        for i in np.where(found)[0]:
            ok, text = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][i]))
            if ok:
                texts.add(text)
        assert "CQ K1ABC FN42" in texts
        # candidate indices must round-trip through the k'-aware unpacker
        for i in np.where(found)[0]:
            fi, pi, cn = pipeline.unpack_candidate_index(
                cfg, int(res.cand_index[0][i]))
            assert 0 <= fi < cfg.num_freqs
            assert 0 <= pi < cfg.scan_depth
            assert 0 <= cn < 2
