"""TPU probe: survivor-selection variants + Pallas BP vs jnp BP (time and
parity). Dev probe; results feed the pipeline tail optimization."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import ldpc, pallas_ldpc, pipeline
from msk144cudecoder_tpu.protocol import ldpc_tables as T
from msk144cudecoder_tpu.protocol import crc as crc_mod


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def loop_time(make_body, digest, args, n_lo=2, n_hi=10, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0, *a):
            def body(i, s):
                return digest(make_body(s, *a)) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        fetch(run(0.0, *args))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); fetch(run(0.0, *args)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


B, NC, K, THRESH = 16, 24064, 512, 3
rng = np.random.default_rng(0)
nbad = jnp.asarray(rng.integers(0, 17, (B, NC)).astype(np.int32))
xb = jnp.asarray((rng.gamma(4.0, 8.0, (B, NC))).astype(np.float32))
print(f"device={jax.devices()[0]}", flush=True)

# parity first (host compare)
i0 = jax.jit(jax.vmap(lambda n, x: pipeline.select_survivors(n, x, K)))(nbad, xb)
i1 = jax.jit(jax.vmap(lambda n, x: pipeline.select_survivors_topk(n, x, K, THRESH)))(nbad, xb)
i0h, i1h = np.asarray(i0), np.asarray(i1)
nb = np.asarray(nbad); xv = np.asarray(xb)
for b in range(B):
    v0 = [(int(nb[b, i]), float(xv[b, i]), int(i)) for i in i0h[b] if nb[b, i] <= THRESH]
    v1 = [(int(nb[b, i]), float(xv[b, i]), int(i)) for i in i1h[b] if nb[b, i] <= THRESH]
    assert v0 == v1, f"valid-set order mismatch window {b}"
print("selection valid-set parity OK", flush=True)

t = loop_time(lambda s, n, x: jax.vmap(lambda nn, xx: pipeline.select_survivors(
    nn, xx + s * 0, K))(n, x), lambda i: jnp.sum(i[0, :4]).astype(jnp.float32), (nbad, xb))
print(f"select sort : {t/B*1e3:7.3f} ms/win", flush=True)
t = loop_time(lambda s, n, x: jax.vmap(lambda nn, xx: pipeline.select_survivors_topk(
    nn, xx + s * 0, K, THRESH))(n, x), lambda i: jnp.sum(i[0, :4]).astype(jnp.float32), (nbad, xb))
print(f"select topk : {t/B*1e3:7.3f} ms/win", flush=True)

# ---- BP: jnp vs pallas, K=512 x B=16 ----------------------------------
rows = []
for i in range(B * K):
    if i % 97 == 0:
        msg = rng.integers(0, 2, 77)
        cw = T.encode(np.concatenate([msg, (crc_mod.CRC_MATRIX @ msg) % 2]))
        rows.append((2.0 * cw - 1.0) * 4.0 + rng.normal(0, 1.0, 128))
    else:
        rows.append(rng.normal(0, 2.0, 128))
llr = jnp.asarray(np.stack(rows).reshape(B, K, 128), jnp.float32)
valid = jnp.asarray(np.ones((B, K), bool))

r0 = jax.jit(jax.vmap(ldpc.bp_decode))(llr, valid)
r1 = jax.jit(jax.vmap(lambda l, v: pallas_ldpc.bp_decode_pallas(l, v)))(llr, valid)
f0, f1 = np.asarray(r0.found), np.asarray(r1.found)
print(f"BP found: jnp={f0.sum()} pallas={f1.sum()} agree={(f0==f1).mean():.4f}", flush=True)
same = f0 == f1
cw_ok = (np.asarray(r0.codeword)[same & f0] == np.asarray(r1.codeword)[same & f1]).all()
print(f"codeword agree on common decodes: {cw_ok}", flush=True)

t = loop_time(lambda s, l, v: jax.vmap(ldpc.bp_decode)(l + s, v).found,
              lambda f: jnp.sum(f[0].astype(jnp.float32)), (llr, valid), 2, 6)
print(f"BP jnp    : {t/B*1e3:7.3f} ms/win", flush=True)
t = loop_time(lambda s, l, v: jax.vmap(lambda ll, vv: pallas_ldpc.bp_decode_pallas(ll, vv))(l + s, v).found,
              lambda f: jnp.sum(f[0].astype(jnp.float32)), (llr, valid), 2, 6)
print(f"BP pallas : {t/B*1e3:7.3f} ms/win", flush=True)
