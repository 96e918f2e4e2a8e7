"""Round-5 scan attribution + coarse-decimation timing probe (dev probe).

Times, on the real chip at the deep-scan config (F=512 padded, depth 6,
B=16, split2 precision):
  full      — the shipping pallas_scan kernel
  mm_only   — correlation matmuls + boundary only (field/select stripped)
  field     — + rolls/accumulate/|s|^2 (select stripped)
  slicemax  — + packed slice maxima (top-8 loop stripped)
  dec2/dec4 — coarse decimated variants (even lags at stride 2/4, rolls in
              decimated space, 128/64-lag slices) WITHOUT refine — the
              upper bound on the coarse-to-fine win
  xla_mm    — the same 9 bf16 passes as bare XLA dot_generals (K=48), plus
              K=96/K=128 contraction-shape micro-benches: is the Pallas
              matmul leaving MXU throughput on the table?

Attribution by difference; loop-timed (n_hi - n_lo deltas, data-dependent
loop body, result fetched — block_until_ready returns at enqueue on this
tunnel).
"""
import functools
import sys, time
import numpy as np, jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from msk144cudecoder_tpu import constants as C
from msk144cudecoder_tpu.config import DecoderConfig
from msk144cudecoder_tpu.ops import pipeline, pallas_scan
from msk144cudecoder_tpu.ops.tables import cached_freq_tables

_N = C.WINDOW_LEN
_SLICES = C.NUM_SCAN_SLICES
_F_TILE = 128

B = 16
cfg = DecoderConfig(search_step=1.0, search_width=500.0, scan_depth=6,
                    nbadsync_threshold=3)
freqs = tuple(float(f) for f in cfg.freqs)
P = cfg.scan_depth
rng = np.random.default_rng(0)
raw = jax.device_put(rng.normal(0, 1000, (B, C.WINDOW_LEN)).astype(np.int16))
c = jax.jit(lambda r: pipeline.preprocess(r, cfg))(raw)
jax.block_until_ready(c)
print(f"device={jax.devices()[0]} B={B} F={len(freqs)}", flush=True)


# ---------------------------------------------------------------- variants
def _kernel_var(scan_depth, num_cand, mm_mode, mode, dec,
                planes_ref, bnd_ri, bops_ref,
                b_re, b_im, e_re, e_im, chi_re, chi_im,
                pos_out, xb_out):
    ft = b_re.shape[1]
    n2 = _N // dec
    slice2 = C.SCAN_SLICE // dec
    pad2 = _SLICES * slice2

    r_re, r_im = pallas_scan._cmmT(planes_ref, bops_ref, mm_mode)

    br, bi = b_re[:], b_im[:]
    nb = bnd_ri.shape[0]
    bdr = bnd_ri[:, : C.SYNC_CORR_LEN]
    bdi = bnd_ri[:, C.SYNC_CORR_LEN : 2 * C.SYNC_CORR_LEN]
    dr, di = pallas_scan._cmm(bdr, bdi, br, bi, mm_mode)
    xr, xi = chi_re[:], chi_im[:]
    corr_re = xr * dr - xi * di
    corr_im = xr * di + xi * dr
    tail = n2 - nb
    r_re = jnp.concatenate([r_re[:tail, :], r_re[tail:, :] + corr_re], axis=0)
    r_im = jnp.concatenate([r_im[:tail, :], r_im[tail:, :] + corr_im], axis=0)

    if mode == "mm_only":
        pos_out[:, :] = jnp.zeros_like(pos_out)
        xb_out[:, :] = jnp.broadcast_to(
            jnp.sum(r_re, axis=0, keepdims=True)
            + jnp.sum(r_im, axis=0, keepdims=True), xb_out.shape)
        return

    er, ei = e_re[:], e_im[:]
    g_re = er * r_re - ei * r_im
    g_im = er * r_im + ei * r_re

    def rolled(x_re, x_im, a: int):
        s = (-a) % n2
        return pltpu.roll(x_re, s, 0), pltpu.roll(x_im, s, 0)

    q3_re, q3_im = rolled(g_re, g_im, C.SECOND_SYNC_SAMPLE // dec)
    q_re = g_re + q3_re
    q_im = g_im + q3_im

    def term(m: int):
        return rolled(q_re, q_im, (864 // dec) * m)

    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (_SLICES, ft), 0)
    lagbits = slice2 - 1  # 255 / 127 / 63
    inv_lag = lagbits - jax.lax.broadcasted_iota(jnp.int32, (slice2, ft), 0)

    acc = [None]

    def select(s_re, s_im, p: int):
        xb = s_re * s_re + s_im * s_im
        if mode == "field":
            acc[0] = xb if acc[0] is None else acc[0] + xb
            return
        padv = xb[: pad2 - n2, :]
        xbp = jnp.concatenate([xb, padv], axis=0)
        maxs = []
        for s in range(_SLICES):
            seg = xbp[s * slice2 : (s + 1) * slice2, :]
            key = jax.lax.bitcast_convert_type(seg, jnp.int32)
            key = (key & ~lagbits) | inv_lag
            maxs.append(jnp.max(key, axis=0, keepdims=True))
        smax = jnp.concatenate(maxs, axis=0)
        if mode == "slicemax":
            acc[0] = smax if acc[0] is None else acc[0] + smax
            return
        cur = smax
        for k in range(num_cand):
            best = jnp.max(cur, axis=0, keepdims=True)
            hit = cur == best
            bslice = jnp.min(jnp.where(hit, lane_iota, _SLICES), axis=0)
            chosen = hit & (lane_iota == bslice[None, :])
            lag_in_slice = lagbits - (best[0, :] & lagbits)
            pos = (dec * (bslice * slice2 + lag_in_slice)) % _N
            row = p * num_cand + k
            pos_out[row : row + 1, :] = pos[None, :]
            xb_out[row : row + 1, :] = jax.lax.bitcast_convert_type(
                best & ~lagbits, jnp.float32)
            cur = jnp.where(chosen, jnp.int32(-(2 ** 31)), cur)

    acc_re, acc_im = q_re, q_im
    select(acc_re, acc_im, 0)
    for p in range(1, min(scan_depth, 6)):
        tre, tim = term(p)
        acc_re = acc_re + tre
        acc_im = acc_im + tim
        select(acc_re, acc_im, p)
    if mode == "field":
        pos_out[:, :] = jnp.zeros_like(pos_out)
        xb_out[:, :] = jnp.broadcast_to(
            jnp.sum(acc[0], axis=0, keepdims=True), xb_out.shape)
        return
    if mode == "slicemax":
        pos_out[:, :] = jnp.broadcast_to(
            jnp.sum(acc[0], axis=0, keepdims=True), pos_out.shape)
        xb_out[:, :] = jnp.zeros_like(xb_out)
        return
    xb_out[:, :] = jnp.sqrt(xb_out[:, :])


def lag_planes_dec(cc, mm_mode, dec):
    """Decimated lag planes with NO strided row slices: de-interleave the
    1-D ext into `dec` phase arrays once (one reshape), then each plane row
    is a CONTIGUOUS slice of one phase: ext[i + dec*k] = phase[i % dec][i//dec + k]."""
    n2 = _N // dec
    ext = jnp.concatenate([cc, cc[: C.SYNC_CORR_LEN - 1]])
    er, ei = ext.real, ext.imag
    ed = er - ei

    def rows(x):
        padlen = -x.shape[0] % dec
        xp = jnp.concatenate([x, jnp.zeros((padlen,), x.dtype)])
        ph = xp.reshape(-1, dec)  # ph[k, r] = x[dec*k + r]
        phases = [ph[:, r] for r in range(dec)]
        m = jnp.stack([
            phases[i % dec][i // dec : i // dec + n2]
            for i in range(C.SYNC_CORR_LEN)])
        return jnp.concatenate(
            [m, jnp.zeros((48 - C.SYNC_CORR_LEN, n2), m.dtype)], axis=0)

    if mm_mode == "fast":
        return jnp.stack([rows(er), rows(ei), rows(ed)]).astype(jnp.bfloat16)
    planes = []
    for x in (er, ei, ed):
        h, l = pallas_scan._split2_xla(x)
        planes += [rows(h), rows(l)]
    return jnp.stack(planes)


def scan_var(cc, mode, dec=1, mm_mode="split2"):
    t = cached_freq_tables(freqs)
    f_total = t.B.shape[1]
    f_pad = -f_total % _F_TILE
    fp = f_total + f_pad

    def pad_f(a, axis):
        if f_pad == 0:
            return jnp.asarray(a)
        padc = [(0, 0)] * a.ndim
        padc[axis] = (0, f_pad)
        return jnp.pad(jnp.asarray(a), padc)

    Bt = pad_f(t.B, 1)
    E = pad_f(t.E, 1)[:: dec]
    chi = pad_f(t.chi, 1)
    n2 = _N // dec

    if dec == 1:
        planes = pallas_scan.lag_planes(cc, mm_mode)
        bnd = pallas_scan.bnd_matrix(cc)
    else:
        planes = lag_planes_dec(cc, mm_mode, dec)
        # decimated-space wrap rows: lag 2d >= N-41 and even
        full_bnd = pallas_scan.bnd_matrix(cc)
        # rows r of bnd are lags N-41+r; keep r with (N-41+r) % dec == 0
        keep = [r for r in range(C.SYNC_CORR_LEN - 1)
                if (_N - (C.SYNC_CORR_LEN - 1) + r) % dec == 0]
        bnd = full_bnd[jnp.asarray(keep)]
    bops = pallas_scan._b_operands(Bt, mm_mode)
    nb = bnd.shape[0]

    n_tiles = fp // _F_TILE
    rows = P * 8
    nplanes = planes.shape[0]
    in_specs = [
        pl.BlockSpec((nplanes, 48, n2), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, 2 * C.SYNC_CORR_LEN), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nplanes, 48, _F_TILE), lambda i: (0, 0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C.SYNC_CORR_LEN, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((C.SYNC_CORR_LEN, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n2, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, _F_TILE), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((rows, _F_TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((rows, fp), jnp.int32),
        jax.ShapeDtypeStruct((rows, fp), jnp.float32),
    ]
    kernel = functools.partial(_kernel_var, P, 8, mm_mode, mode, dec)
    pos, xb = pl.pallas_call(
        kernel, grid=(n_tiles,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=False,
    )(planes, bnd, bops, Bt.real, Bt.imag,
      jnp.asarray(E).real, jnp.asarray(E).imag,
      jnp.asarray(chi).real, jnp.asarray(chi).imag)
    return pos, xb


def loop_time(fn, n_lo=4, n_hi=16, iters=3):
    times = {}
    for n in (n_lo, n_hi):
        @jax.jit
        def run(cc, s0):
            def body(i, s):
                p_, x_ = fn(cc + s.astype(jnp.complex64))
                return jnp.sum(x_[:, 0, 0]) * 1e-30 + s * 0.0
            return jax.lax.fori_loop(0, n, body, s0)
        float(run(c, 0.0))
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            float(run(c, 0.0))
            ts.append(time.perf_counter() - t0)
        times[n] = min(ts)
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo)


def main():
    results = {}
    # correctness spot-check of dec variants vs full on one window: planted
    from msk144cudecoder_tpu import golden as G
    a = G.synthesize_audio_int16([("CQ K1ABC FN42", 1500.0)], 6, snr_db=10.0,
                                 rng=np.random.default_rng(1))
    cw = jax.jit(lambda r: pipeline.preprocess(r, cfg))(
        jnp.asarray(a)[None, :])[0]
    posf, xbf = jax.jit(lambda w: scan_var(w, "full", 1))(cw)
    pos2, xb2 = jax.jit(lambda w: scan_var(w, "full", 2))(cw)
    pf, xf = np.asarray(posf), np.asarray(xbf)
    p2, x2 = np.asarray(pos2), np.asarray(xb2)
    k = np.unravel_index(np.argmax(xf), xf.shape)
    # (rows = p*8+k, F): best candidate position parity within +-1
    print(f"planted best: full pos={pf[k]} xb={xf[k]:.1f} | "
          f"dec2 pos={p2[k]} xb={x2[k]:.1f}", flush=True)

    for name, mode, dec in [
        ("full", "full", 1),
        ("mm_only", "mm_only", 1),
        ("field", "field", 1),
        ("slicemax", "slicemax", 1),
        ("dec2", "full", 2),
        ("dec2_mm", "mm_only", 2),
        ("dec4", "full", 4),
    ]:
        fn = lambda cc, m=mode, d=dec: jax.vmap(
            lambda w: scan_var(w, m, d))(cc)
        t = loop_time(fn)
        results[name] = t / B * 1e3
        print(f"{name:10s}: {t/B*1e3:7.4f} ms/win", flush=True)

    # XLA speed-of-light micro-benches for the contraction shapes
    key = jax.random.PRNGKey(0)
    for kdim, rows in [(48, 5184), (48, 2592), (96, 5184), (128, 5184)]:
        a = jax.random.normal(key, (kdim, rows), jnp.bfloat16)
        b = jax.random.normal(key, (kdim, 128), jnp.bfloat16)
        dn = (((0,), (0,)), ((), ()))

        def mm9(a_, b_):
            out = 0.0
            for i in range(9):
                out = out + jax.lax.dot_general(
                    a_ + jnp.bfloat16(i * 1e-8), b_, dimension_numbers=dn,
                    preferred_element_type=jnp.float32)
            return out

        def fn(n):
            @jax.jit
            def run(a_, b_, s0):
                def body(i, s):
                    o = mm9(a_ + s.astype(jnp.bfloat16), b_)
                    return jnp.sum(o[0]) * 1e-30 + s * 0.0
                return jax.lax.fori_loop(0, n, body, s0)
            return run
        nlo, nhi = 128, 512
        r4 = fn(nlo); r16 = fn(nhi)
        float(r4(a, b, 0.0)); float(r16(a, b, 0.0))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter(); float(r4(a, b, 0.0))
            t1 = time.perf_counter(); float(r16(a, b, 0.0))
            ts.append((time.perf_counter() - t1 - (t1 - t0)) / (nhi - nlo))
        t = min(ts)
        fl = 9 * 2 * kdim * rows * 128 / t
        print(f"xla 9x dot K={kdim:3d} rows={rows}: {t*1e6:8.2f} us "
              f"({fl/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
