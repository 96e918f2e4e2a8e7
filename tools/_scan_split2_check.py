"""Hardware check: split2 scan kernel vs jnp HIGHEST scan — candidate
agreement, xb relative error, and timing (dev probe)."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan, scan

cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
freqs = tuple(float(f) for f in cfg.freqs)
P = cfg.scan_depth

rng = np.random.default_rng(7)
a = G.synthesize_audio_int16([("CQ K1ABC FN42", 1480.0)], 6, snr_db=-2.0,
                             rng=rng)
prep = jax.jit(lambda r: pipeline.preprocess(r, cfg))
c_sig = prep(a[None])[0]
noise = rng.normal(0, 1000, (C.WINDOW_LEN,)).astype(np.int16)
c_nse = prep(noise[None])[0]

for name, cw in (("signal@-2dB", c_sig), ("noise", c_nse)):
    pos0, xb0 = jax.jit(lambda w: scan.scan(w, freqs, P))(cw)
    pos1, xb1 = jax.jit(lambda w: pallas_scan.scan_pallas(w, freqs, P))(cw)
    p0, p1 = np.asarray(pos0), np.asarray(pos1)
    x0, x1 = np.asarray(xb0), np.asarray(xb1)
    agree = (p0 == p1).mean()
    relerr = np.abs(x1 - x0) / np.maximum(np.abs(x0), 1e-9)
    # candidate SETS per (freq, pattern) cell
    set_match = np.mean([
        len(set(p0[f, p]) & set(p1[f, p])) / p0.shape[2]
        for f in range(p0.shape[0]) for p in range(P)])
    print(f"{name:12s} pos-agree={agree:.4f} set-match={set_match:.4f} "
          f"xb-relerr max={relerr.max():.2e} mean={relerr.mean():.2e}",
          flush=True)
    # pass bars (run_hwtests step): candidate value-sets essentially
    # identical, xb within the split-2 error class. pos agreement is lower
    # by construction — near-tied slice maxima legitimately swap between
    # the two float formulations (SURVEY §7 hard part 5).
    assert set_match >= 0.90, f"{name}: candidate set-match {set_match:.3f}"
    assert relerr.max() <= 1e-4, f"{name}: xb rel err {relerr.max():.2e}"
    assert agree >= 0.75, f"{name}: pos agreement {agree:.3f}"
print("OK", flush=True)
