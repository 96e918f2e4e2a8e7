"""Microbench of the pipeline glue: prefilter top_k, pos gather, survivor
select, LLR row gather, result compaction. Loop method. Dev probe."""
import sys, time
import numpy as np, jax
import jax.numpy as jnp
sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline

B = 16
NC = 24048
PRE = 1024
K = 512
rng = np.random.default_rng(0)
xb = jax.device_put(rng.random((B, NC)).astype(np.float32))
pos = jax.device_put(rng.integers(0, 5184, (B, NC)).astype(np.int32))
nbad = jax.device_put(rng.integers(0, 17, (B, PRE)).astype(np.int32))
xbp = jax.device_put(rng.random((B, PRE)).astype(np.float32))
sb = jax.device_put(rng.normal(0, 1, (B, PRE, 128)).astype(np.float32))
top = jax.device_put(rng.integers(0, PRE, (B, K)).astype(np.int32))
found = jax.device_put((rng.random((B, K)) < 0.01))
print(f"device={jax.devices()[0]} B={B}", flush=True)


def loop_time(fn, args, n_lo=4, n_hi=16, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0):
            def body(i, s):
                r = fn(s, *args)
                return jnp.sum(jax.tree_util.tree_leaves(r)[0][..., :1].astype(jnp.float32)) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        float(run(0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter(); float(run(0.0)); ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def t_topk(s, xb):
    return jax.vmap(lambda x: jax.lax.top_k(x + s, PRE)[0])(xb)

def t_topk_idx_gather(s, xb, pos):
    def one(x, p_):
        xs, idx = jax.lax.top_k(x + s, PRE)
        return xs, p_[idx]
    return jax.vmap(one)(xb, pos)

def t_pos_gather(s, pos, top):
    return jax.vmap(lambda p_, t_: p_[t_] + s.astype(jnp.int32))(pos[:, :PRE], top)

def t_select(s, nbad, xbp):
    return jax.vmap(lambda n, x: pipeline.select_survivors_topk(n, x + s, K, 3))(nbad, xbp)

def t_llr_gather(s, sb, top):
    return jax.vmap(lambda s_, t_: s_[t_] + s)(sb, top)

def t_compact(s, found, top):
    def one(f, t_):
        _, sel = jax.lax.sort(((~f).astype(jnp.int32),
                               jnp.arange(K, dtype=jnp.int32)), num_keys=2)
        sel = sel[:64]
        return t_[sel] + s.astype(jnp.int32)
    return jax.vmap(one)(found, top)

for name, fn, args in [
    ("top_k 24048->1024 (vals)", t_topk, (xb,)),
    ("top_k + pos gather", t_topk_idx_gather, (xb, pos)),
    ("pos[top] 1024ofPRE", t_pos_gather, (pos, top[:, :PRE//2])),
    ("select_topk PRE->K", t_select, (nbad, xbp)),
    ("llr rows sb[top] KofPRE", t_llr_gather, (sb, top)),
    ("compaction sort+gather", t_compact, (found, top)),
]:
    t = loop_time(fn, args)
    print(f"{name:28s}: {t/B*1e3:7.3f} ms/win", flush=True)
