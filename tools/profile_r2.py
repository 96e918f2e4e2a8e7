"""Round-2 HONEST profiling. block_until_ready does NOT await execution over
the axon tunnel (dispatch floors masquerade as exec time; a 24G-FLOP matmul
"measures" 314 TFLOP/s > chip peak). Two honest methods, cross-checked:

  loop(n):   run the op n times inside one jit via lax.fori_loop with a
             loop-carried epsilon perturbation (defeats hoisting/CSE), fetch a
             scalar digest to host. Slope over n = true device time per op.
  chain(m):  m dispatches of the jitted fn, each input data-dependent on the
             previous output, one final scalar fetch. Measures steady-state
             per-call time including dispatch (but not per-call fetch).

Usage: python tools/profile_r2.py [--iters 3]
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from msk144cudecoder_tpu import constants as C  # noqa: E402
from msk144cudecoder_tpu.config import DecoderConfig  # noqa: E402
from msk144cudecoder_tpu.ops import ldpc, pipeline  # noqa: E402
from msk144cudecoder_tpu.ops import pallas_demod, pallas_scan  # noqa: E402


def fetch(x):
    return np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[0]


def timed(f, *a):
    t0 = time.perf_counter()
    r = fetch(f(*a))
    return time.perf_counter() - t0, r


def loop_time(make_body, digest, n_lo=2, n_hi=10, iters=3, *args):
    """True device time per op: jit(fori(n)) slope between n_lo and n_hi."""
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(s0, *a):
            def body(i, s):
                return digest(make_body(s, *a)) * 1e-30
            return jax.lax.fori_loop(0, n, body, s0)
        ts = []
        timed(run, 0.0, *args)  # compile
        for _ in range(iters):
            ts.append(timed(run, 0.0, *args)[0])
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def chain_time(step, x0, m=16, iters=3):
    """Steady-state per-call time via data-dependent dispatch chain."""
    x = step(x0)
    fetch(x)
    ts = []
    for _ in range(iters):
        x = x0
        t0 = time.perf_counter()
        for _ in range(m):
            x = step(x)
        fetch(x)
        ts.append((time.perf_counter() - t0) / m)
    return min(ts)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()
    it = args.iters

    print(f"device={jax.devices()[0]} backend={jax.default_backend()}",
          flush=True)
    cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                        nbadsync_threshold=3, max_survivors=512)
    freqs = tuple(float(f) for f in cfg.freqs)
    NC = cfg.num_candidates
    rng = np.random.default_rng(0)

    # --- transfer/dispatch overheads --------------------------------------
    xs = jax.device_put(np.ones((8, 128), np.float32))
    triv = jax.jit(lambda x: x * 2.0 + 1.0)
    fetch(triv(xs))
    t0 = time.perf_counter(); fetch(triv(xs)); t_rt = time.perf_counter() - t0
    print(f"single call+fetch round trip: {t_rt*1e3:8.3f} ms", flush=True)
    t_tc = chain_time(triv, xs, m=64, iters=it)
    print(f"chained trivial per-call:     {t_tc*1e3:8.3f} ms", flush=True)

    # --- full pipeline: true exec time per batch, chained -----------------
    full = jax.jit(lambda r: pipeline.decode_raw(r, cfg))
    for b in (16, 32, 64):
        raw = jax.device_put(
            rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16))

        def step(x, _raw=raw, _full=full):
            res = _full(x)
            z = (res.num_survivors[0] & 0).astype(jnp.int16)
            return _raw + z
        try:
            t = chain_time(step, raw, m=8, iters=it)
            rtf = C.HOP_LEN / (t / b) / C.SAMPLE_RATE
            print(f"full chained B={b:3d}: {t*1e3:8.2f} ms/call "
                  f"{t/b*1e3:7.3f} ms/win  rtf={rtf:7.1f}x", flush=True)
        except Exception as e:
            print(f"full B={b}: FAILED {type(e).__name__}: {e}", flush=True)

    # --- stage split via loop method at B=16 ------------------------------
    b = 16
    raw = jax.device_put(rng.normal(0, 1000, (b, C.WINDOW_LEN)).astype(np.int16))
    c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
    pos, xb = jax.jit(jax.vmap(
        lambda w: pallas_scan.scan_pallas(w, freqs, cfg.scan_depth)))(c)
    sb, nbad = jax.jit(jax.vmap(
        lambda w, p_: pallas_demod.demod_pallas(w, freqs, p_)))(c, pos)
    jax.block_until_ready((c, pos, xb, sb, nbad))

    t_pre = loop_time(
        lambda s, r: pipeline.preprocess(r + (s * 0).astype(jnp.int16), cfg),
        lambda cc: jnp.sum(jnp.abs(cc[0, :8])), 2, 8, it, raw)
    print(f"stage pre:    {t_pre/b*1e3:7.3f} ms/win", flush=True)

    t_scan = loop_time(
        lambda s, cc: jax.vmap(lambda w: pallas_scan.scan_pallas(
            w, freqs, cfg.scan_depth))(cc + s.astype(jnp.complex64))[1],
        lambda xbv: jnp.sum(xbv[0, 0, 0]), 2, 6, it, c)
    print(f"stage scan:   {t_scan/b*1e3:7.3f} ms/win", flush=True)

    t_demod = loop_time(
        lambda s, cc, pp: jax.vmap(lambda w, p_: pallas_demod.demod_pallas(
            w, freqs, p_))(cc + s.astype(jnp.complex64), pp)[0],
        lambda sbv: jnp.sum(sbv[0, 0, 0, :8]), 2, 6, it, c, pos)
    print(f"stage demod:  {t_demod/b*1e3:7.3f} ms/win", flush=True)

    def tail_op(s, xb_, nbad_, sb_):
        def one(xbw, nbadw, sbw):
            xb_f = xbw.reshape(NC) + s * 0
            top = pipeline.select_survivors(nbadw.reshape(NC), xb_f, 512)
            llr = sbw.reshape(NC, 128)[top]
            valid = nbadw.reshape(NC)[top] <= cfg.nbadsync_threshold
            bp = ldpc.bp_decode(llr, valid)
            return bp.found
        return jax.vmap(one)(xb_, nbad_, sb_)

    t_tail = loop_time(
        tail_op, lambda f: jnp.sum(f[0].astype(jnp.float32)), 2, 6, it,
        xb, nbad, sb)
    print(f"stage sel+bp: {t_tail/b*1e3:7.3f} ms/win", flush=True)

    # split tail further: selection only
    def sel_op(s, xb_, nbad_):
        def one(xbw, nbadw):
            top = pipeline.select_survivors(
                nbadw.reshape(NC), xbw.reshape(NC) + s * 0, 512)
            return top
        return jax.vmap(one)(xb_, nbad_)
    t_sel = loop_time(sel_op, lambda t: jnp.sum(t[0, :4]).astype(jnp.float32),
                      2, 8, it, xb, nbad)
    print(f"stage select: {t_sel/b*1e3:7.3f} ms/win", flush=True)

    # --- microbenches (loop method) ---------------------------------------
    M_, K_, N_ = 24064, 1024, 256
    a32 = jax.device_put(rng.normal(size=(M_, K_)).astype(np.float32))
    b32 = jax.device_put(rng.normal(size=(K_, N_)).astype(np.float32))
    for name, prec, bb in (
        ("f32 DEFAULT", jax.lax.Precision.DEFAULT, b32),
        ("f32 HIGH   ", jax.lax.Precision.HIGH, b32),
        ("f32 HIGHEST", jax.lax.Precision.HIGHEST, b32),
        ("bf16       ", jax.lax.Precision.DEFAULT, b32.astype(jnp.bfloat16)),
    ):
        aa = a32.astype(bb.dtype)
        t = loop_time(
            lambda s, x, y: jnp.matmul(
                x * (1.0 + s).astype(x.dtype), y, precision=prec,
                preferred_element_type=jnp.float32),
            lambda o: o[0, 0], 2, 10, it, aa, bb)
        print(f"microB MF matmul {name}: {t*1e3:7.3f} ms "
              f"({2*M_*K_*N_/t/1e12:6.1f} TFLOP/s)", flush=True)

    # roll+select rounds in plain XLA (VPU model; pallas variant in kernel
    # rebuild will confirm)
    x = jax.device_put(rng.normal(size=(M_, K_)).astype(np.float32))
    rr = jax.device_put(
        np.broadcast_to(rng.integers(0, 128, (M_, 1)), (M_, K_))
        .astype(np.int32).copy())

    def shift7(s, xv, rv):
        xv = xv * (1.0 + s)
        for bit in (64, 32, 16, 8, 4, 2, 1):
            xv = jnp.where((rv & bit) != 0, jnp.roll(xv, -bit, axis=1), xv)
        return xv
    t = loop_time(shift7, lambda o: o[0, 0], 2, 6, it, x, rr)
    print(f"microA 7-round roll+select ({M_}x{K_} f32): {t*1e3:7.3f} ms",
          flush=True)

    # top_k vs 3-key sort on the selection problem
    keyf = jax.device_put(rng.normal(size=(16, NC)).astype(np.float32))
    nb = jax.device_put(rng.integers(0, 5, (16, NC)).astype(np.int32))
    t = loop_time(
        lambda s, k: jax.lax.top_k(k + s, 512)[1],
        lambda o: jnp.sum(o[0, :4]).astype(jnp.float32), 2, 8, it, keyf)
    print(f"microC top_k f32 x16:   {t*1e3:7.3f} ms ({t/16*1e3:6.3f}/win)",
          flush=True)
    t = loop_time(
        lambda s, n, k: jax.vmap(lambda nn, kk: pipeline.select_survivors(
            nn, kk + s, 512))(n, k),
        lambda o: jnp.sum(o[0, :4]).astype(jnp.float32), 2, 8, it, nb, keyf)
    print(f"microC 3-op sort x16:   {t*1e3:7.3f} ms ({t/16*1e3:6.3f}/win)",
          flush=True)

    # row gather (sb_f[top_idx]) cost
    sbf = jax.device_put(rng.normal(size=(16, NC, 128)).astype(np.float32))
    idx = jax.device_put(rng.integers(0, NC, (16, 512)).astype(np.int32))
    t = loop_time(
        lambda s, sb_, ix: jax.vmap(lambda a, i: a[i])(sb_ + s, ix),
        lambda o: o[0, 0, 0], 2, 8, it, sbf, idx)
    print(f"microE row-gather 512x128 x16: {t*1e3:7.3f} ms "
          f"({t/16*1e3:6.3f}/win)", flush=True)


if __name__ == "__main__":
    main()
