import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from msk144cudecoder_tpu import constants as C, golden as G
from msk144cudecoder_tpu.ops import scan, softbits, pallas_scan, pallas_demod, analytic
which = sys.argv[1]
# NOTE: complex64 H2D/D2H transfers are UNIMPLEMENTED over the axon tunnel --
# all complex values must be created and consumed on-device inside jit.
a = G.synthesize_audio_int16([('CQ K1ABC FN42', 1500.0)], 6, snr_db=8.0, rng=np.random.default_rng(3))
raw = jax.device_put(a)
freqs = tuple(float(f) for f in np.arange(1250.0, 1751.0, 1.0))
depth = 6
rng = np.random.default_rng(0)
pos_np = rng.integers(0, C.WINDOW_LEN, (len(freqs), depth, 8)).astype(np.int32)
pos = jax.device_put(pos_np)

if which == 'scan':
    f_p = jax.jit(lambda r: sum(jnp.sum(x.astype(jnp.float32)) for x in
        pallas_scan.scan_pallas(analytic.analytic_method2(analytic.rms_normalize(r)), freqs, depth)))
    f_j = jax.jit(lambda r: sum(jnp.sum(x.astype(jnp.float32)) for x in
        scan.scan(analytic.analytic_method2(analytic.rms_normalize(r)), freqs, depth)))
    t0=time.perf_counter(); dp = np.asarray(f_p(raw)); print(f'pallas scan compile+run {time.perf_counter()-t0:.1f}s', flush=True)
    t0=time.perf_counter()
    for _ in range(10): dp = np.asarray(f_p(raw))
    print(f'pallas scan: {(time.perf_counter()-t0)/10*1e3:.2f} ms/win (incl roundtrip)', flush=True)
    t0=time.perf_counter(); dj = np.asarray(f_j(raw))
    for _ in range(10): dj = np.asarray(f_j(raw))
    print(f'jnp scan:    {(time.perf_counter()-t0)/10*1e3:.2f} ms/win (incl roundtrip)', flush=True)
    # full-output comparison
    g_p = jax.jit(lambda r: pallas_scan.scan_pallas(analytic.analytic_method2(analytic.rms_normalize(r)), freqs, depth))
    g_j = jax.jit(lambda r: scan.scan(analytic.analytic_method2(analytic.rms_normalize(r)), freqs, depth))
    pp_, xp = [np.asarray(x) for x in g_p(raw)]
    pj, xj = [np.asarray(x) for x in g_j(raw)]
    print('xb close:', np.allclose(xp, xj, rtol=1e-3, atol=1e-3), ' pos match:', float((pp_==pj).mean()), flush=True)
else:
    def demod_p(r, p):
        c = analytic.analytic_method2(analytic.rms_normalize(r))
        return pallas_demod.demod_pallas(c, freqs, p)
    def demod_j(r, p):
        c = analytic.analytic_method2(analytic.rms_normalize(r))
        return softbits.demod_candidates(c, freqs, depth, p)
    f_p = jax.jit(lambda r, p: sum(jnp.sum(x.astype(jnp.float32)) for x in demod_p(r, p)))
    f_j = jax.jit(lambda r, p: sum(jnp.sum(x.astype(jnp.float32)) for x in demod_j(r, p)))
    t0=time.perf_counter(); dp = np.asarray(f_p(raw, pos)); print(f'pallas demod compile+run {time.perf_counter()-t0:.1f}s', flush=True)
    t0=time.perf_counter()
    for _ in range(10): dp = np.asarray(f_p(raw, pos))
    print(f'pallas demod: {(time.perf_counter()-t0)/10*1e3:.2f} ms/win (incl roundtrip)', flush=True)
    t0=time.perf_counter(); dj = np.asarray(f_j(raw, pos))
    t0=time.perf_counter()
    for _ in range(3): dj = np.asarray(f_j(raw, pos))
    print(f'jnp demod:    {(time.perf_counter()-t0)/3*1e3:.2f} ms/win (incl roundtrip)', flush=True)
    g_p = jax.jit(demod_p); g_j = jax.jit(demod_j)
    sbp, nbp = [np.asarray(x) for x in g_p(raw, pos)]
    sbj, nbj = [np.asarray(x) for x in g_j(raw, pos)]
    print('sb close:', np.allclose(sbp, sbj, rtol=5e-3, atol=5e-3), ' nbad match:', float((nbp==nbj).mean()), flush=True)
