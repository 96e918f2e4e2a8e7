"""xb-prefilter + survivor-only demod (ops/pallas_survivor.py).

Validates the gamma-factorized mixing against the table-mixed full demod
(ops/softbits.py), the kernel (interpreter) against the jnp reference math,
and end-to-end decode parity between the prefiltered and full pipelines.
On-TPU compiled parity is exercised by tools/_surv_probe.py / bench runs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pallas_survivor, pipeline, scan, softbits

CFG = DecoderConfig(search_width=100.0, scan_depth=6, nbadsync_threshold=3,
                    max_survivors=128)
FREQS = tuple(float(f) for f in CFG.freqs)


@pytest.fixture(scope="module")
def window():
    a = G.synthesize_audio_int16(
        [("CQ K1ABC FN42", 1505.0)], 6, snr_db=6.0,
        rng=np.random.default_rng(7))
    raw = jnp.asarray(a[None, :])
    return pipeline.preprocess(raw, CFG)[0]


@pytest.fixture(scope="module")
def candidates(window):
    pos, xb = scan.scan(window, FREQS, CFG.scan_depth)
    nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
    xb_f = np.asarray(xb).reshape(nc)
    pre_idx = jnp.asarray(np.argsort(-xb_f)[:256].astype(np.int32))
    per_f = pos.shape[1] * pos.shape[2]
    return (pos, pre_idx, pre_idx // per_f,
            (pre_idx % per_f) // pos.shape[2], pos.reshape(nc)[pre_idx])


class TestGammaMath:
    def test_ref_matches_full_demod(self, window, candidates):
        """gamma-factorized mixing == table mixing up to f32 rounding: the
        softbits agree to LLR tolerance and nbadsync exactly."""
        pos, pre_idx, f_idx, p_idx, pos_s = candidates
        nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
        sb_all, nbad_all = softbits.demod_candidates(
            window, FREQS, CFG.scan_depth, pos)
        sb_g = np.asarray(sb_all.reshape(nc, 128))[np.asarray(pre_idx)]
        nbad_g = np.asarray(nbad_all.reshape(nc))[np.asarray(pre_idx)]

        sb_r, nbad_r = pallas_survivor.demod_survivors_ref(
            window, FREQS, pos_s, f_idx, p_idx)
        np.testing.assert_array_equal(np.asarray(nbad_r), nbad_g)
        rel = np.abs(np.asarray(sb_r) - sb_g) / (np.abs(sb_g) + 1e-3)
        assert rel.max() < 5e-3

    def test_kernel_interpreter_matches_ref(self, window, candidates):
        _, _, f_idx, p_idx, pos_s = candidates
        sb_r, nbad_r = pallas_survivor.demod_survivors_ref(
            window, FREQS, pos_s, f_idx, p_idx)
        sb_k, nbad_k = pallas_survivor.demod_survivors(
            window, FREQS, pos_s, f_idx, p_idx, interpret=True)
        np.testing.assert_array_equal(np.asarray(nbad_k), np.asarray(nbad_r))
        rel = (np.abs(np.asarray(sb_k) - np.asarray(sb_r))
               / (np.abs(np.asarray(sb_r)) + 1e-3))
        assert rel.max() < 5e-3

    def test_tiered_terms_match_flat(self, window, candidates):
        """The tiered path (active-frame terms only) matches the flat
        6-frame layout: zero-mask rows contribute exact zeros, so the only
        differences are 1-ulp fma-fusion artifacts in the gamma products
        (XLA fuses complex multiplies differently across graphs)."""
        _, _, f_idx, p_idx, pos_s = candidates
        import msk144cudecoder_tpu.constants as C

        for p in (0, 2, 5, 6):  # incl. a gap pattern
            n = 16
            tl = tuple(int(x) for x in np.nonzero(C.PATTERN_MASKS[p])[0])
            pp = jnp.full((n,), p, jnp.int32)
            ps = pos_s[:n]
            fi = f_idx[:n]
            sb_flat, nb_flat = pallas_survivor.demod_survivors(
                window, FREQS, ps, fi, pp, interpret=True, sb_blk=n)
            sb_t, nb_t = pallas_survivor.demod_survivors(
                window, FREQS, ps, fi, pp, interpret=True, sb_blk=n,
                terms=tl)
            np.testing.assert_array_equal(np.asarray(nb_t),
                                          np.asarray(nb_flat))
            np.testing.assert_allclose(np.asarray(sb_t),
                                       np.asarray(sb_flat),
                                       rtol=1e-4, atol=1e-4)

    def test_wrap_positions(self, window):
        """Candidates whose frames wrap the window boundary (the k=1/2 gamma
        branches) still match the table-mixed demod."""
        F = len(FREQS)
        pos_s = jnp.asarray(np.tile([5000, 5183, 4321, 3500], 32).astype(np.int32))
        f_idx = jnp.asarray((np.arange(128) * 7 % F).astype(np.int32))
        p_idx = jnp.asarray((np.arange(128) % 8).astype(np.int32))
        pos = jnp.zeros((F, 8, 1), jnp.int32)
        pos = pos.at[f_idx, p_idx, 0].set(pos_s)  # scatter for golden gather
        sb_all, nbad_all = softbits.demod_candidates(window, FREQS, 8, pos)
        sb_g = np.asarray(sb_all)[np.asarray(f_idx), np.asarray(p_idx), 0]
        nbad_g = np.asarray(nbad_all)[np.asarray(f_idx), np.asarray(p_idx), 0]

        sb_r, nbad_r = pallas_survivor.demod_survivors_ref(
            window, FREQS, pos_s, f_idx, p_idx)
        np.testing.assert_array_equal(np.asarray(nbad_r), nbad_g)
        rel = np.abs(np.asarray(sb_r) - sb_g) / (np.abs(sb_g) + 1e-3)
        assert rel.max() < 5e-3


class TestPrefilterPipeline:
    @staticmethod
    def _decode_summary(res, cfg):
        """Per-message (best num_avg, best nbadsync) — exactly what the
        output line depends on after ResultFilter dedup (the per-cell
        prefilter cap may drop redundant duplicate-lag decodes of the same
        message within one (freq, pattern) cell, so raw candidate sets are
        not comparable across paths)."""
        from msk144cudecoder_tpu import constants as C

        found = np.asarray(res.found)
        best = {}
        for bits, cand, nbad in zip(pipeline.unpack_message_bits(np.asarray(res.message_bits)[found]),
                                    np.asarray(res.cand_index)[found],
                                    np.asarray(res.nbadsync)[found]):
            _, p_idx, _ = pipeline.unpack_candidate_index(cfg, int(cand))
            key = (int(C.PATTERN_NUM_AVG[p_idx]), int(nbad))
            t = tuple(bits)
            best[t] = min(best.get(t, key), key)
        return best

    def test_decode_parity_with_full_path(self, window):
        # max_survivors large enough that the full path does not truncate
        # its survivor set (a truncated batch under-reports low-num_avg
        # decodes and makes the comparison depend on batch composition)
        cfg_full = CFG.replace(survivor_prefilter=0, use_pallas=False,
                               max_survivors=512)
        cfg_pre = CFG.replace(survivor_prefilter=512, use_pallas=False,
                              max_survivors=512)
        full = jax.jit(lambda w: pipeline.decode_window_tables(
            w, FREQS, cfg_full))(window)
        pre = jax.jit(lambda w: pipeline.decode_window_tables(
            w, FREQS, cfg_pre))(window)
        sum_full = self._decode_summary(full, cfg_full)
        sum_pre = self._decode_summary(pre, cfg_pre)
        assert sum_full == sum_pre and len(sum_full) == 1

    def test_noise_only_no_decodes(self):
        rng = np.random.default_rng(11)
        raw = jnp.asarray(
            rng.normal(0, 1000, (1, 5184)).astype(np.int16))
        w = pipeline.preprocess(raw, CFG)[0]
        pre = jax.jit(lambda x: pipeline.decode_window_tables(
            x, FREQS, CFG.replace(survivor_prefilter=256, use_pallas=False)))(w)
        assert not np.asarray(pre.found).any()

    def test_resolve_prefilter(self):
        cfg = CFG
        # auto: on for pallas path (2x max_survivors); off on jnp path
        assert pipeline.resolve_prefilter(cfg, 24048, True) == 2 * cfg.max_survivors
        assert pipeline.resolve_prefilter(cfg, 24048, False) == 0
        # explicit values round up; >= nc disables
        assert pipeline.resolve_prefilter(
            cfg.replace(survivor_prefilter=100), 24048, False) == 128
        assert pipeline.resolve_prefilter(
            cfg.replace(survivor_prefilter=30000), 24048, True) == 0
        assert pipeline.resolve_prefilter(
            cfg.replace(survivor_prefilter=0), 24048, True) == 0
