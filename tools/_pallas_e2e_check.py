import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from msk144cudecoder_tpu import constants as C, golden as G
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline
cfg_p = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6, nbadsync_threshold=3, max_survivors=512, use_pallas=True)
rng = np.random.default_rng(0)
msg = G.synthesize_audio_int16([('CQ K1ABC FN42', 1500.0)], 6, snr_db=4.0, rng=rng)
B = 4
raw = np.concatenate([msg[None,:], rng.normal(0,1000,(B-1,C.WINDOW_LEN)).astype(np.int16)])
raw_dev = jax.device_put(raw)
dig = jax.jit(lambda r: (lambda res: (res.found.sum(), res.xb.sum(), res.nbadsync.sum()))(pipeline.decode_raw(r, cfg_p)))
t0=time.perf_counter(); d = [np.asarray(x) for x in dig(raw_dev)]
print(f'compile+run {time.perf_counter()-t0:.1f}s  found={d[0]}', flush=True)
t0=time.perf_counter(); n=5
for _ in range(n): d = [np.asarray(x) for x in dig(raw_dev)]
dt=(time.perf_counter()-t0)/n
print(f'pallas deep: {dt*1e3:.2f} ms/call ({B} win) = {dt/B*1e3:.2f} ms/win rtf={C.HOP_LEN/(dt/B)/12000:,.0f}x', flush=True)
res = pipeline.decode_raw(raw_dev, cfg_p)
found = np.asarray(res.found[0])
from msk144cudecoder_tpu.protocol import msg77
h = msg77.CallsignHashTable()
texts = set()
for k in np.nonzero(found)[0]:
    ok, t = msg77.unpack77(pipeline.unpack_message_bits(res.message_bits[0][k]), h)
    if ok: texts.add(t)
print('decoded:', texts, flush=True)
