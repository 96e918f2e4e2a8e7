import sys; sys.path.insert(0, "/root/repo")
import numpy as np, time
import jax, jax.numpy as jnp
from msk144cudecoder_tpu import constants as C, golden as G
from msk144cudecoder_tpu.ops import scan, softbits, pallas_scan, pallas_demod
which = sys.argv[1]
a = G.synthesize_audio_int16([('CQ K1ABC FN42', 1500.0)], 6, snr_db=8.0, rng=np.random.default_rng(3))
cdat = jnp.asarray(G.analytic_method2(G.rms_normalize_int16(a)).astype(np.complex64))
freqs = tuple(float(f) for f in np.arange(1250.0, 1751.0, 1.0))
if which == 'scan':
    f = jax.jit(lambda c: sum(jnp.sum(x.astype(jnp.float32)) for x in pallas_scan.scan_pallas(c, freqs, 6)))
    t0=time.perf_counter(); d = np.asarray(f(cdat)); print(f'scan compile+run {time.perf_counter()-t0:.1f}s')
    t0=time.perf_counter()
    for _ in range(10): d = np.asarray(f(cdat))
    print(f'pallas scan: {(time.perf_counter()-t0)/10*1e3:.2f} ms/win (incl ~29ms roundtrip)')
    p0, x0 = scan.scan(cdat, freqs, 6)
    p1, x1 = pallas_scan.scan_pallas(cdat, freqs, 6)
    print('xb close:', np.allclose(np.asarray(x0), np.asarray(x1), rtol=1e-3, atol=1e-3))
else:
    za = softbits.pattern_average(softbits.mix_all(cdat, freqs), 6)
    pos = jnp.asarray(np.random.default_rng(0).integers(0, C.WINDOW_LEN, (len(freqs), 6, 8), dtype=np.int32))
    f = jax.jit(lambda z, p: sum(jnp.sum(x.astype(jnp.float32)) for x in pallas_demod.demod_pallas(z, p)))
    t0=time.perf_counter(); d = np.asarray(f(za, pos)); print(f'demod compile+run {time.perf_counter()-t0:.1f}s')
    t0=time.perf_counter()
    for _ in range(10): d = np.asarray(f(za, pos))
    print(f'pallas demod: {(time.perf_counter()-t0)/10*1e3:.2f} ms/win (incl ~29ms roundtrip)')
    sb0, nb0 = softbits.demod_candidates(cdat, freqs, 6, pos)
    sb1, nb1 = pallas_demod.demod_pallas(za, pos)
    print('sb close:', np.allclose(np.asarray(sb0), np.asarray(sb1), rtol=5e-3, atol=5e-3),
          ' nbad:', float((np.asarray(nb0)==np.asarray(nb1)).mean()))
