"""Full decode_raw device timing on TPU (loop method). Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu import golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3, max_survivors=512)
rng = np.random.default_rng(0)
msg = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6, snr_db=4.0, rng=rng)
noise = rng.normal(0, 1000.0, (B - 1, C.WINDOW_LEN)).astype(np.int16)
raw = jax.device_put(np.concatenate([msg[None, :], noise]))
print(f"device={jax.devices()[0]} B={B}", flush=True)

res = pipeline.decode_raw(raw, cfg)
jax.block_until_ready(res)
assert bool(np.asarray(res.found[0]).any()), "stimulus failed to decode"
print("decode ok", flush=True)

def loop_time(n_lo=4, n_hi=16, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(rr, s0):
            def body(i, s):
                r = pipeline.decode_raw(rr + s.astype(jnp.int16), cfg)
                # digest feeds the next iteration's input: not DCE-able
                return s + (r.nbadsync[0, 0] % 2).astype(jnp.int32)
            return jax.lax.fori_loop(0, n, body, s0)
        int(run(raw, 0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); int(run(raw, 0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)

t = loop_time()
print(f"decode_raw: {t/B*1e3:7.3f} ms/win  rtf={C.HOP_LEN/(t/B)/C.SAMPLE_RATE:,.0f}x", flush=True)
