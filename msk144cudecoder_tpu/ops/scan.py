"""Wideband sync scan as one MXU matmul + roll-combines.

TPU-native redesign of the reference scan kernel
(/root/reference/src/scan_kernel.cuh:27-366). The reference re-mixes the
window and redoes the 42-tap correlation for every (frequency, pattern) pair.
We factor the math so the expensive correlation is computed ONCE per
frequency, shared by all averaging patterns:

With z_f(t) = c(t) * exp(-2j*pi*f*(t mod N)/fs) the per-(f,p) metric is
    s_p(f, lag) = sum_i conj(u_p((lag+i) mod N)) * cb42[i],
    u_p(tau)    = sum_m mask_p[m] * (z_f((tau+864m) mod N)
                                     + z_f((tau+864m+336) mod N)).
Linearity turns this into
    s_p(f, lag) = sum_m mask_p[m] * (G_f((lag+864m) mod N)
                                     + G_f((lag+864m+336) mod N)),
    G_f(l)      = sum_i conj(z_f((l+i) mod N)) * cb42[i]
                = E_f(l) * sum_i conj(c~(l+i)) * cb42[i] * exp(2j*pi*f*i/fs)
with E_f(l) = exp(2j*pi*f*l/fs) and c~ the window extended by its own head
(the final 41 lags wrap; wrapped taps additionally pick up
chi_f = exp(-2j*pi*f*N/fs) because the reference mixes on wrapped indices —
we add that correction exactly with a second tiny matmul).

So the whole frequency scan is one (N,42) x (42,F) complex matmul (MXU), a
(41,42) x (42,F) boundary matmul, and 12 rolls+adds — ~40x less arithmetic
than the reference's formulation at scan depth 6, and it lands on the MXU
instead of scalar cores.

Candidate selection mirrors the reference: best lag per 256-lag slice (21
slices, the last wrapping past N), then top-8 slice maxima per (f, p)
(scan_kernel.cuh:85-364). Positions are canonicalized mod N (the reference
can emit aliased pos >= N whose deep-pattern averaging then reads out of
bounds; see SURVEY.md quirks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_N = C.WINDOW_LEN
_HIGHEST = jax.lax.Precision.HIGHEST


@functools.lru_cache(maxsize=None)
def _scan_tables(freqs_key: tuple) -> dict:
    """Per-frequency-grid constant tables (host-side, cached per config)."""
    freqs = np.asarray(freqs_key, dtype=np.float64)
    i = np.arange(C.SYNC_CORR_LEN)
    # B[i, f] = cb42[i] * exp(+2j*pi*f*i/fs)
    B = C.CB42[:, None] * np.exp(2j * np.pi * freqs[None, :] * i[:, None] / C.SAMPLE_RATE)
    # E[l, f] = exp(+2j*pi*f*l/fs), phases reduced mod 1 in f64 before complex64
    l = np.arange(_N)
    phase = np.mod(np.outer(l, freqs) / C.SAMPLE_RATE, 1.0)
    E = np.exp(2j * np.pi * phase)
    # chi_f - 1: wrap correction factor for taps that cross the window end
    chi = np.exp(-2j * np.pi * freqs * _N / C.SAMPLE_RATE) - 1.0
    return {
        "B": B.astype(np.complex64),
        "E": E.astype(np.complex64),
        "chi": chi.astype(np.complex64),
    }


def _lag_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """(N, 42) matrix Cmat[l, i] = c~(l+i), c~ = window extended by its head."""
    ext = jnp.concatenate([c, c[: C.SYNC_CORR_LEN - 1]])
    idx = np.arange(_N)[:, None] + np.arange(C.SYNC_CORR_LEN)[None, :]
    return ext[idx]


def _boundary_matrix(c: jnp.ndarray) -> jnp.ndarray:
    """(41, 42) wrapped-tap contributions for lags l = N-41+r: taps with
    l+i >= N read c[l+i-N]; all other entries zero."""
    r = np.arange(C.SYNC_CORR_LEN - 1)[:, None]
    i = np.arange(C.SYNC_CORR_LEN)[None, :]
    wrapped = i >= (C.SYNC_CORR_LEN - 1) - r  # l+i >= N
    idx = np.where(wrapped, r + i - (C.SYNC_CORR_LEN - 1), 0)
    return jnp.where(jnp.asarray(wrapped), c[idx], 0.0 + 0.0j)


def sync_correlation(c: jnp.ndarray, freqs: tuple) -> jnp.ndarray:
    """G (N, F) complex64: 42-tap cyclic sync correlation of the wrapped-mixed
    window at every (lag, frequency)."""
    t = _scan_tables(freqs)
    B = jnp.asarray(t["B"])
    cmat = _lag_matrix(c)
    R = jnp.matmul(jnp.conj(cmat), B, precision=_HIGHEST)  # (N, F)
    D = jnp.matmul(jnp.conj(_boundary_matrix(c)), B, precision=_HIGHEST)  # (41, F)
    R = R.at[_N - (C.SYNC_CORR_LEN - 1) :, :].add(jnp.asarray(t["chi"])[None, :] * D)
    return jnp.asarray(t["E"]) * R


def pattern_metrics(G: jnp.ndarray, scan_depth: int) -> jnp.ndarray:
    """xb (P, N, F) float32: |s_p(f, lag)| for the first `scan_depth` patterns.

    Exploits that patterns 1..6 are prefixes (cumulative sums of per-frame
    terms) and patterns 7..8 are sparse combinations (msk_context.cuh:231-240).
    """
    T = [
        jnp.roll(G, -864 * m, axis=0) + jnp.roll(G, -(864 * m + C.SECOND_SYNC_SAMPLE), axis=0)
        for m in range(C.PATTERN_LEN)
    ]
    S = []
    acc = T[0]
    S.append(acc)  # pattern 0: frame 1
    for m in range(1, 6):
        acc = acc + T[m]
        S.append(acc)  # patterns 1..5: prefixes
    S.append(T[0] + T[3])  # pattern 6: 100100
    S.append(T[0] + T[3] + T[4])  # pattern 7: 100110
    return jnp.abs(jnp.stack(S[:scan_depth], axis=0)).astype(jnp.float32)


def select_candidates(xb: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per (pattern, freq): best lag in each 256-lag slice, then top-8 slices.

    xb: (P, N, F) -> (pos, xb_top) each (F, P, 8) with pos in [0, N).
    """
    P = xb.shape[0]
    F = xb.shape[2]
    pad = jnp.concatenate([xb, xb[:, : C.SCAN_PAD_LEN - _N, :]], axis=1)
    sl = pad.reshape(P, C.NUM_SCAN_SLICES, C.SCAN_SLICE, F)
    slice_max = sl.max(axis=2)  # (P, 21, F)
    slice_arg = sl.argmax(axis=2).astype(jnp.int32)
    sm = slice_max.transpose(2, 0, 1)  # (F, P, 21)
    sa = slice_arg.transpose(2, 0, 1)
    top_xb, top_slice = jax.lax.top_k(sm, C.NUM_CANDIDATES_PER_PATTERN)
    pos = (top_slice * C.SCAN_SLICE + jnp.take_along_axis(sa, top_slice, axis=-1)) % _N
    return pos.astype(jnp.int32), top_xb


def scan(c: jnp.ndarray, freqs: tuple, scan_depth: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Full scan of one window: returns (pos, xb), each (F, scan_depth, 8)."""
    G = sync_correlation(c, freqs)
    xb = pattern_metrics(G, scan_depth)
    return select_candidates(xb)
