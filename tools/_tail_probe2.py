"""TPU probe: where does the non-BP tail time go? Times the survivor gather
(sb_f[top_idx]) and the full tail vs its parts. Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from msk144cudecoder_tpu.ops import ldpc, pipeline


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
xb = jnp.asarray(rng.gamma(4.0, 8.0, (B, NC)).astype(np.float32))
sb = jnp.asarray(rng.normal(0, 2, (B, NC, 128)).astype(np.float32))
top = jax.jit(jax.vmap(lambda n, x: pipeline.select_survivors_topk(n, x, K, THRESH)))(nbad, xb)
jax.block_until_ready(top)
print(f"device={jax.devices()[0]}", flush=True)

t = loop_time(lambda s, sbv, ti: jax.vmap(lambda a, i: a[(i + s.astype(jnp.int32) * 0)])(sbv, ti),
              lambda l: jnp.sum(l[0, 0, :4]), (sb, top), 2, 10)
print(f"llr row-gather (512 of 24064,128): {t/B*1e3:7.3f} ms/win", flush=True)

t = loop_time(lambda s, nv, ti: jax.vmap(lambda a, i: a[(i + s.astype(jnp.int32) * 0)])(nv, ti),
              lambda l: jnp.sum(l[0, :4]).astype(jnp.float32), (nbad, top), 2, 10)
print(f"1d gathers (nbad):                 {t/B*1e3:7.3f} ms/win", flush=True)


def tail(s, nv, xv, sbv):
    def one(n, x, sbw):
        ti = pipeline.select_survivors_topk(n, x + s * 0, K, THRESH)
        nk = n[ti]
        valid = nk <= THRESH
        llr = sbw[ti]
        bp = ldpc.bp_decode(llr, valid)
        r = 64
        _, sel = jax.lax.sort(((~bp.found).astype(jnp.int32),
                               jnp.arange(K, dtype=jnp.int32)), num_keys=2)
        sel = sel[:r]
        return (ti[sel], bp.found[sel], bp.codeword[sel], nk[sel],
                x[ti][sel], bp.iterations[sel])
    return jax.vmap(one)(nv, xv, sbv)


t = loop_time(tail, lambda o: jnp.sum(o[1][0].astype(jnp.float32)),
              (nbad, xb, sb), 2, 6)
print(f"full tail (select+gather+bp+compact): {t/B*1e3:7.3f} ms/win", flush=True)
