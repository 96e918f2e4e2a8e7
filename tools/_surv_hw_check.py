"""Hardware parity check: compiled survivor-demod kernel vs the jnp
reference math on real candidates (signal + wrap positions), flat and
tiered. Dev probe; exits nonzero on mismatch."""
import sys
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan, pallas_survivor

cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
freqs = tuple(float(f) for f in cfg.freqs)
P = cfg.scan_depth
rng = np.random.default_rng(3)
a = G.synthesize_audio_int16([("CQ K1ABC FN42", 1490.0)], 6, snr_db=0.0,
                             rng=rng)
w = jax.jit(lambda r: pipeline.preprocess(r, cfg))(jnp.asarray(a[None]))[0]

pos, xb = jax.jit(lambda ww: pallas_scan.scan_pallas(ww, freqs, P))(w)
nc = pos.shape[0] * pos.shape[1] * pos.shape[2]
xb_f = np.asarray(xb).reshape(nc)
pre_idx = np.argsort(-xb_f)[:256].astype(np.int32)
per_f = pos.shape[1] * pos.shape[2]
f_idx = jnp.asarray(pre_idx // per_f)
p_idx = jnp.asarray((pre_idx % per_f) // pos.shape[2])
pos_s = jnp.asarray(np.asarray(pos).reshape(nc)[pre_idx])
# add explicit wrap positions
pos_s = jnp.concatenate([pos_s[:192],
                         jnp.asarray(np.tile([5000, 5183, 4321, 3500], 16)
                                     .astype(np.int32))])

cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    w_cpu = pipeline.preprocess(jax.device_put(jnp.asarray(a[None]), cpu),
                                cfg)[0]
# ship the CPU window to the TPU bit-identically (complex transfers are
# unimplemented on this runtime: send f32 planes, rebuild on device)
w_np = np.asarray(w_cpu)
w = jax.jit(jax.lax.complex)(jnp.asarray(w_np.real.astype(np.float32)),
                             jnp.asarray(w_np.imag.astype(np.float32)))


def ref(ps, fi, pp, tl=None):
    with jax.default_device(cpu):
        return pallas_survivor.demod_survivors_ref(
            w_cpu, freqs, jax.device_put(ps, cpu), jax.device_put(fi, cpu),
            jax.device_put(pp, cpu), terms=tl)


ok = True
sb_r, nb_r = ref(np.asarray(pos_s), np.asarray(f_idx), np.asarray(p_idx))
sb_k, nb_k = jax.jit(lambda ww, a1, a2, a3: pallas_survivor.demod_survivors(
    ww, freqs, a1, a2, a3))(w, pos_s, f_idx, p_idx)
same_nb = np.array_equal(np.asarray(nb_k), np.asarray(nb_r))
d = np.abs(np.asarray(sb_k) - np.asarray(sb_r))
excess = (d / (5e-3 + 5e-3 * np.abs(np.asarray(sb_r)))).max()
print(f"flat:   nbad equal={same_nb} abs-err max={d.max():.2e} "
      f"tol-excess={excess:.3f} (pass<1)", flush=True)
ok &= same_nb and excess < 1.0

# tiered: per-pattern segments with static terms
for p in (0, 2, 5):
    m = np.asarray(p_idx) == p
    if m.sum() < 8:
        continue
    n = int(m.sum()) // 8 * 8
    ps, fi = pos_s[np.nonzero(m)[0][:n]], f_idx[np.nonzero(m)[0][:n]]
    pp = jnp.full((n,), p, jnp.int32)
    tl = tuple(int(x) for x in np.nonzero(C.PATTERN_MASKS[p])[0])
    sb_r, nb_r = ref(np.asarray(ps), np.asarray(fi), np.asarray(pp), tl)
    sb_k, nb_k = jax.jit(lambda ww, a1, a2, a3, tl=tl, n=n:
                         pallas_survivor.demod_survivors(
                             ww, freqs, a1, a2, a3, sb_blk=n,
                             terms=tl))(w, ps, fi, pp)
    same_nb = np.array_equal(np.asarray(nb_k), np.asarray(nb_r))
    d = np.abs(np.asarray(sb_k) - np.asarray(sb_r))
    excess = (d / (5e-3 + 5e-3 * np.abs(np.asarray(sb_r)))).max()
    print(f"tier p={p}: nbad equal={same_nb} abs-err max={d.max():.2e} "
          f"tol-excess={excess:.3f} (pass<1)", flush=True)
    ok &= same_nb and excess < 1.0

print("OK" if ok else "MISMATCH", flush=True)
sys.exit(0 if ok else 1)
