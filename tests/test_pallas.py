"""Pallas kernel parity vs the jnp reference ops (interpreter on CPU; the
same kernels compile on TPU — exercised by bench/driver runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pallas_demod, pallas_scan, pipeline, scan, softbits


@pytest.fixture(scope="module")
def cdat():
    a = G.synthesize_audio_int16(
        [("CQ K1ABC FN42", 1500.0)], 6, snr_db=8.0, rng=np.random.default_rng(3)
    )
    return jnp.asarray(G.analytic_method2(G.rms_normalize_int16(a)).astype(np.complex64))


FREQS = tuple(float(f) for f in np.arange(1450.0, 1551.0, 2.0))


class TestPallasScan:
    @pytest.mark.parametrize("depth", [1, 4, 6, 8])
    @pytest.mark.parametrize("dec", [1, 2, 4])
    def test_matches_jnp_scan(self, cdat, depth, dec):
        """Candidate equivalence, not bit-identity: near-tied slice maxima can
        swap ranks between the two float formulations (SURVEY §7 hard part 5);
        the xb value-sets must still agree and most positions coincide.
        Parametrized over the scan_decimation grid — the decimated kernel
        must match the jnp coarse select the same way the full one does."""
        pos0, xb0 = scan.scan(cdat, FREQS, depth, dec=dec)
        pos1, xb1 = pallas_scan.scan_pallas(cdat, FREQS, depth, dec=dec)
        np.testing.assert_allclose(np.asarray(xb0), np.asarray(xb1), rtol=1e-4, atol=1e-4)
        p0, p1 = np.asarray(pos0), np.asarray(pos1)
        x0, x1 = np.asarray(xb0), np.asarray(xb1)
        assert (p0 % dec == 0).all() and (p1 % dec == 0).all()
        exact = (p0 == p1).mean()
        assert exact > 0.85
        for f in range(p0.shape[0]):
            for p in range(depth):
                # per-cell candidate value-sets are interchangeable
                np.testing.assert_allclose(
                    np.sort(x0[f, p]), np.sort(x1[f, p]), rtol=1e-3, atol=1e-3)
                assert len(set(p0[f, p]) & set(p1[f, p])) >= 5

    def test_decimated_select_semantics(self, cdat):
        """The coarse grid is the full field subsampled: each dec-grid
        candidate's xb equals the full field's value at that (even) lag, and
        each slice winner is the argmax over the slice's coarse lags."""
        freqs = FREQS
        G_ = scan.sync_correlation(cdat, freqs)
        xb = scan.pattern_metrics(G_, 4)
        for dec in (2, 4):
            pos, top = scan.select_candidates(xb, dec=dec)
            pos_n, top_n = np.asarray(pos), np.asarray(top)
            field = np.asarray(
                jnp.concatenate([xb, xb[:, : C.SCAN_PAD_LEN - C.WINDOW_LEN, :]],
                                axis=1))
            assert (pos_n % dec == 0).all()
            # spot-check: every reported xb is the field value at pos
            for f in (0, 17):
                for p in range(4):
                    for k in range(8):
                        lag = pos_n[f, p, k]
                        vals = {field[p, lag, f]}
                        if lag < C.SCAN_PAD_LEN - C.WINDOW_LEN:
                            vals.add(field[p, lag + C.WINDOW_LEN, f])
                        assert any(abs(v - top_n[f, p, k]) < 1e-3 * max(abs(v), 1)
                                   for v in vals)

    def test_nonmultiple_freq_count(self, cdat):
        freqs = FREQS[:37]
        pos0, xb0 = scan.scan(cdat, freqs, 3)
        pos1, xb1 = pallas_scan.scan_pallas(cdat, freqs, 3)
        assert pos1.shape == (37, 3, 8)
        np.testing.assert_allclose(np.asarray(xb0), np.asarray(xb1), rtol=1e-4, atol=1e-4)


class TestPallasDemod:
    def test_matches_jnp_demod(self, cdat):
        pos = jnp.asarray(
            np.random.default_rng(0).integers(0, C.WINDOW_LEN, (len(FREQS), 4, 8), dtype=np.int32))
        sb0, nb0 = softbits.demod_candidates(cdat, FREQS, 4, pos)
        sb1, nb1 = pallas_demod.demod_pallas(cdat, FREQS, pos)
        np.testing.assert_allclose(np.asarray(sb0), np.asarray(sb1), rtol=2e-3, atol=2e-3)
        assert (np.asarray(nb0) == np.asarray(nb1)).all()

    def test_vmap_batching(self, cdat):
        pos = jnp.asarray(
            np.random.default_rng(1).integers(0, C.WINDOW_LEN, (len(FREQS), 3, 8), dtype=np.int32))
        sb1, nb1 = pallas_demod.demod_pallas(cdat, FREQS, pos)
        sbv, nbv = jax.vmap(lambda cc, pp: pallas_demod.demod_pallas(cc, FREQS, pp))(
            jnp.stack([cdat, cdat]), jnp.stack([pos, pos]))
        np.testing.assert_array_equal(np.asarray(sbv[0]), np.asarray(sbv[1]))
        np.testing.assert_allclose(np.asarray(sbv[0]), np.asarray(sb1), rtol=1e-5, atol=1e-5)


class TestPallasLDPC:
    def _llr_batch(self, k=24, n_good=10, seed=5):
        from msk144cudecoder_tpu.protocol import crc as crc_mod
        from msk144cudecoder_tpu.protocol import ldpc_tables as T

        rng = np.random.default_rng(seed)
        rows = []
        for _ in range(n_good):
            msg = rng.integers(0, 2, 77)
            cw = T.encode(np.concatenate([msg, (crc_mod.CRC_MATRIX @ msg) % 2]))
            rows.append((2.0 * cw - 1.0) * 4.0 + rng.normal(0, 1.0, 128))
        for _ in range(k - n_good):
            rows.append(rng.normal(0, 2.0, 128))
        return jnp.asarray(np.stack(rows), jnp.float32)

    def test_matches_jnp_bp_exactly(self):
        """The one-hot selection matmuls are exact under both schemes (3x-bf16
        split vs CPU f32), so interpreter output is bit-identical to ldpc.py."""
        from msk144cudecoder_tpu.ops import ldpc, pallas_ldpc

        llr = self._llr_batch()
        valid = jnp.asarray(np.ones(llr.shape[0], bool))
        r0 = ldpc.bp_decode(llr, valid)
        r1 = pallas_ldpc.bp_decode_pallas(llr, valid, interpret=True)
        np.testing.assert_array_equal(np.asarray(r0.found), np.asarray(r1.found))
        assert np.asarray(r1.found).sum() >= 10
        np.testing.assert_array_equal(np.asarray(r0.codeword), np.asarray(r1.codeword))
        np.testing.assert_array_equal(np.asarray(r0.iterations), np.asarray(r1.iterations))
        np.testing.assert_array_equal(np.asarray(r0.hard_errors), np.asarray(r1.hard_errors))

    def test_validity_mask_blocks_decode(self):
        from msk144cudecoder_tpu.ops import pallas_ldpc

        llr = self._llr_batch(k=8, n_good=8, seed=7)
        valid = jnp.asarray(np.array([True, False] * 4))
        r = pallas_ldpc.bp_decode_pallas(llr, valid, interpret=True)
        found = np.asarray(r.found)
        assert found[0::2].all() and not found[1::2].any()

    def test_row_chunk_padding(self, monkeypatch):
        """Flat batches that are not a multiple of the row chunk pad up
        instead of collapsing to one giant grid step (a 6-window busy-band
        batch at K=4848 is 29088 rows — unchunked it blows VMEM on TPU).
        Padded rows are invalid and must not perturb real rows."""
        from msk144cudecoder_tpu.ops import ldpc, pallas_ldpc

        monkeypatch.setattr(pallas_ldpc, "_ROW_CHUNK", 16)
        llr = self._llr_batch(k=24, n_good=10, seed=13)  # 24 % 16 != 0
        valid = jnp.asarray(np.ones(24, bool))
        r0 = ldpc.bp_decode(llr, valid)
        r1 = pallas_ldpc.bp_decode_pallas(llr, valid, interpret=True)
        assert np.asarray(r1.found).shape == (24,)
        np.testing.assert_array_equal(np.asarray(r0.found), np.asarray(r1.found))
        np.testing.assert_array_equal(np.asarray(r0.codeword), np.asarray(r1.codeword))
        np.testing.assert_array_equal(np.asarray(r0.iterations),
                                      np.asarray(r1.iterations))

    def test_vmap_batching(self):
        from msk144cudecoder_tpu.ops import ldpc, pallas_ldpc

        llr = self._llr_batch(k=16, n_good=6, seed=11)
        valid = jnp.asarray(np.ones(16, bool))
        r1 = pallas_ldpc.bp_decode_pallas(llr, valid, interpret=True)
        rv = jax.vmap(lambda l: pallas_ldpc.bp_decode_pallas(l, valid, interpret=True))(
            jnp.stack([llr, llr]))
        np.testing.assert_array_equal(np.asarray(rv.found[0]), np.asarray(rv.found[1]))
        np.testing.assert_array_equal(np.asarray(rv.found[0]), np.asarray(r1.found))
        np.testing.assert_array_equal(np.asarray(rv.codeword[0]), np.asarray(r1.codeword))


class TestPallasPipeline:
    def test_end_to_end_decode_matches(self):
        """use_pallas=True must find the same messages as the jnp path."""
        from msk144cudecoder_tpu.protocol import msg77

        a = G.synthesize_audio_int16(
            [("K1ABC W9XYZ EN37", 1496.0)], 6, snr_db=6.0, rng=np.random.default_rng(9))
        base = DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128)
        texts = {}
        for use_pallas in (False, True):
            cfg = base.replace(use_pallas=use_pallas)
            res = pipeline.decode_raw(a[None, :], cfg)
            h = msg77.CallsignHashTable()
            found = set()
            for k in np.nonzero(np.asarray(res.found[0]))[0]:
                ok, t = msg77.unpack77(
                    pipeline.unpack_message_bits(res.message_bits[0][k]), h)
                if ok:
                    found.add(t)
            texts[use_pallas] = found
        assert texts[False] == texts[True] == {"K1ABC W9XYZ EN37"}

    def test_fast_math_flag_decodes(self):
        """fast_math relaxes MXU precision; decode must still succeed."""
        from msk144cudecoder_tpu.protocol import msg77

        a = G.synthesize_audio_int16(
            [("CQ K1ABC FN42", 1500.0)], 6, snr_db=8.0, rng=np.random.default_rng(2))
        cfg = DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128,
                            use_pallas=True, fast_math=True)
        res = pipeline.decode_raw(a[None, :], cfg)
        h = msg77.CallsignHashTable()
        found = set()
        for k in np.nonzero(np.asarray(res.found[0]))[0]:
            ok, t = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][k]), h)
            if ok:
                found.add(t)
        assert found == {"CQ K1ABC FN42"}

    def test_iq_mode_pallas(self):
        from msk144cudecoder_tpu.protocol import msg77

        iq = G.synthesize_iq_int8(
            [("K1ABC W9XYZ EN37", 20.0)], 6, snr_db=10.0, rng=np.random.default_rng(6))
        cfg = DecoderConfig.create(read_mode=2, search_width=100.0, scan_depth=3,
                                   max_survivors=128, use_pallas=True)
        res = pipeline.decode_raw(iq[None, :], cfg)
        h = msg77.CallsignHashTable()
        found = set()
        for k in np.nonzero(np.asarray(res.found[0]))[0]:
            ok, t = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][k]), h)
            if ok:
                found.add(t)
        assert found == {"K1ABC W9XYZ EN37"}

    def test_analytic_method1_pallas(self):
        from msk144cudecoder_tpu.protocol import msg77

        a = G.synthesize_audio_int16(
            [("CQ K1ABC FN42", 1500.0)], 6, snr_db=10.0, rng=np.random.default_rng(4))
        cfg = DecoderConfig(search_width=100.0, scan_depth=3, max_survivors=128,
                            analytic_method=1, use_pallas=True)
        res = pipeline.decode_raw(a[None, :], cfg)
        h = msg77.CallsignHashTable()
        found = set()
        for k in np.nonzero(np.asarray(res.found[0]))[0]:
            ok, t = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][k]), h)
            if ok:
                found.add(t)
        assert found == {"CQ K1ABC FN42"}


class TestBatchedDecodeRaw:
    def test_flat_batched_equals_per_window(self):
        """decode_raw flat-batches the demod (windows per grid step) and BP
        (whole batch's survivors in one kernel call); results must equal the
        per-window decode_window_tables path element for element. (Verified
        on v5e hardware for a 16-window deep-scan batch; this interpreter
        run guards the layout bookkeeping.)"""
        import jax
        import numpy as np

        from msk144cudecoder_tpu import golden as G
        from msk144cudecoder_tpu.ops import pipeline

        cfg = DecoderConfig(search_width=100.0, scan_depth=3,
                            max_survivors=128, use_pallas=True,
                            survivor_prefilter=256)
        rng = np.random.default_rng(5)
        rows = [G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6,
                                         snr_db=4.0, rng=rng)]
        rows.append(rng.normal(0, 1000, (5184,)).astype(np.int16))
        raw = jnp.asarray(np.stack(rows))
        res_b = pipeline.decode_raw(raw, cfg)
        freqs = tuple(float(f) for f in cfg.freqs)
        res_w = jax.vmap(lambda w: pipeline.decode_window_tables(
            w, freqs, cfg))(pipeline.preprocess(raw, cfg))
        assert np.asarray(res_b.found).any()
        for f in res_b._fields:
            a, b = np.asarray(getattr(res_b, f)), np.asarray(getattr(res_w, f))
            np.testing.assert_array_equal(a, b, err_msg=f)


def test_bp_kernel_validated_on_tpu_hardware():
    """Documents that the COMPILED BP kernel was validated against the jnp
    oracle on real v5e hardware (tools/check_kernels_tpu.py — pytest itself
    runs the kernels through the interpreter only, tests/conftest.py)."""
    import json
    import pathlib

    p = pathlib.Path(__file__).parent / "data" / "kernels_tpu_check.json"
    rec = json.loads(p.read_text())
    assert "TPU" in rec["device"]
    assert rec["jnp_found"] > 0
    for mode in ("exact", "fast"):
        assert rec[mode]["found_eq"] and rec[mode]["codeword_eq"]
        assert rec[mode]["iterations_eq"]
