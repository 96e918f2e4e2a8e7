"""CPU-side golden check of the TPU survivor-demod dump (/tmp/surv_tpu.npz
from tools/_surv_probe.py). Dev probe."""
import sys
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import pallas_survivor

d = np.load("/tmp/surv_tpu.npz")
c = (d["c_re"] + 1j * d["c_im"]).astype(np.complex64)
freqs = tuple(float(f) for f in d["freqs"])
sb_r, nb_r = pallas_survivor.demod_survivors_ref(
    c, freqs, d["pos_s"], d["f_idx"], d["p_idx"])
sb_r, nb_r = np.asarray(sb_r), np.asarray(nb_r)
rel = np.abs(d["sb"] - sb_r) / (np.abs(sb_r) + 1e-3)
print(f"TPU kernel vs CPU ref: max relerr {rel.max():.3e} "
      f"median {np.median(rel):.2e} nbad mismatches {(d['nbad'] != nb_r).sum()}"
      f" / {nb_r.size}")
