"""TPU probe: compiled survivor-demod kernel parity vs interpreter + timing,
and full-pipeline timing with the xb prefilter. Dev probe."""
import sys, time
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
rng = np.random.default_rng(0)
msg = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6, snr_db=4.0, rng=rng)
B = 16
noise = rng.normal(0.0, 1000.0, (B - 1, C.WINDOW_LEN)).astype(np.int16)
raw = jax.device_put(np.concatenate([msg[None, :], noise]))
print(f"device={jax.devices()[0]}", flush=True)

c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
pos, xb = jax.jit(jax.vmap(lambda w: pallas_scan.scan_pallas(w, freqs, cfg.scan_depth)))(c)
jax.block_until_ready((c, pos, xb))

nc = pos.shape[1] * pos.shape[2] * pos.shape[3]
PRE = 2048
def pre_split(xbw, posw):
    xb_sel, pre_idx = jax.lax.top_k(xbw.reshape(nc), PRE)
    per_f = posw.shape[1] * posw.shape[2]
    return pre_idx, pre_idx // per_f, (pre_idx % per_f) // posw.shape[2], posw.reshape(nc)[pre_idx]

pre_idx, f_idx, p_idx, pos_s = jax.jit(jax.vmap(pre_split))(xb, pos)

# parity: run the compiled kernel on window 0, dump inputs+outputs for a
# CPU-side check (tools/_surv_check_cpu.py) — the jnp ref math on the TPU
# backend compiles a pathological gather, and complex arrays cannot cross
# the axon tunnel, so the golden comparison runs in a separate CPU process.
sb_c, nb_c = jax.jit(lambda cc, p, f, pp: pallas_survivor.demod_survivors(
    cc, freqs, p, f, pp))(c[0], pos_s[0], f_idx[0], p_idx[0])
np.savez("/tmp/surv_tpu.npz",
         c_re=np.asarray(c[0].real), c_im=np.asarray(c[0].imag),
         pos_s=np.asarray(pos_s[0]), f_idx=np.asarray(f_idx[0]),
         p_idx=np.asarray(p_idx[0]), sb=np.asarray(sb_c),
         nbad=np.asarray(nb_c), freqs=np.asarray(freqs))
print("parity dump written to /tmp/surv_tpu.npz", flush=True)

def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]

def loop_time(fn, args, n_lo=2, n_hi=10, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0, *a):
            def body(i, s):
                return fetch_d(fn(s, *a))
            return jax.lax.fori_loop(0, n, body, s0)
        def fetch_d(x):
            return jnp.sum(jax.tree_util.tree_leaves(x)[0][..., 0, :4].astype(jnp.float32)) * 1e-30
        ts = []
        fetch(run(0.0, *args))
        for _ in range(iters):
            t0 = time.perf_counter(); fetch(run(0.0, *args)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

t = loop_time(lambda s, cc, p, f, pp: jax.vmap(lambda a, b, d, e: pallas_survivor.demod_survivors(
    a + s.astype(jnp.complex64), freqs, b, d, e))(cc, p, f, pp), (c, pos_s, f_idx, p_idx))
print(f"survivor demod kernel (PRE={PRE}): {t/B*1e3:7.3f} ms/win", flush=True)

# full pipeline: prefilter vs not
for pf in (0, 1024, 2048):
    cfg_p = cfg.replace(survivor_prefilter=pf)
    t = loop_time(lambda s, r: pipeline.decode_raw(r + (s * 0).astype(jnp.int16), cfg_p), (raw,), 2, 6)
    print(f"pipeline prefilter={pf}: {t/B*1e3:7.3f} ms/win", flush=True)
    res = pipeline.decode_raw(raw, cfg_p)
    found = np.asarray(res.found)
    ci = np.asarray(res.cand_index)[0][found[0]]
    print(f"  window0 decodes={found[0].sum()} cands={sorted(ci.tolist())[:8]} "
          f"noise-window decodes={found[1:].sum()}", flush=True)
