"""Analytic-signal preprocessing as batched JAX ops.

TPU-native reimplementation of the reference's two conversion paths:
  method 2  shift -fs/8, 15-tap half-band FIR applied twice (second pass
            time-reversed for zero phase), shift +fs/8, with a 32-sample
            zero halo (/root/reference/src/analytic2.cuh:236-258)
  method 1  8192-pt FFT Hilbert transform with a raised-cosine band filter
            (/root/reference/src/analytic_fft.cu:84-157)
  IQ LPF    FIR-only path for 8-bit IQ input (src/analytic2.cuh:261-281)

All ops take (..., 5184) batches so windows can be vmapped/sharded; the FIR is
expressed as 13 shifted adds (taps with |h|<=1e-4 are zero), which XLA fuses
into a single VPU pass — no convolution primitive needed at this size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .. import constants as C

_PAD = C.FIR_PAD
_N = C.WINDOW_LEN
_TOTAL = _N + 2 * _PAD


def _fir_taps() -> list[tuple[int, float]]:
    return [(k, float(h)) for k, h in enumerate(C.FIR15) if h != 0.0]


def _fir_forward(x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_k h[k] * x[i+15-k] for i in [0, n-32); tail unchanged."""
    n = x.shape[-1]
    m = n - 32
    acc = jnp.zeros_like(x[..., :m])
    for k, h in _fir_taps():
        acc = acc + h * jax.lax.slice_in_dim(x, 15 - k, 15 - k + m, axis=-1)
    return jnp.concatenate([acc, x[..., m:]], axis=-1)


def _fir_backward(x: jnp.ndarray) -> jnp.ndarray:
    """out[i] = sum_k h[k] * x[i-15+k] for i in [32, n); head unchanged."""
    n = x.shape[-1]
    m = n - 32
    acc = jnp.zeros_like(x[..., :m])
    for k, h in _fir_taps():
        acc = acc + h * jax.lax.slice_in_dim(x, 17 + k, 17 + k + m, axis=-1)
    return jnp.concatenate([x[..., :32], acc], axis=-1)


@functools.lru_cache(maxsize=None)
def _shift_tables() -> tuple[np.ndarray, np.ndarray]:
    n = np.arange(_TOTAL)
    left = np.exp(-2j * np.pi * (n + 1) / 8.0).astype(np.complex64)
    right = np.exp(2j * np.pi * n / 8.0).astype(np.complex64)
    return left, right


def _pad(x: jnp.ndarray) -> jnp.ndarray:
    pad_cfg = [(0, 0)] * (x.ndim - 1) + [(_PAD, _PAD)]
    return jnp.pad(x, pad_cfg)


def analytic_method2(x: jnp.ndarray) -> jnp.ndarray:
    """Real (..., 5184) normalized samples -> complex64 analytic signal."""
    left, right = _shift_tables()
    z = _pad(x.astype(jnp.float32)).astype(jnp.complex64)
    z = z * jnp.asarray(left)
    z = _fir_backward(_fir_forward(z))
    z = z * jnp.asarray(right)
    return z[..., _PAD : _PAD + _N]


def iq_filter(z: jnp.ndarray) -> jnp.ndarray:
    """Complex (..., 5184) IQ samples -> low-pass filtered (read mode 2)."""
    z = _pad(z.astype(jnp.complex64))
    z = _fir_backward(_fir_forward(z))
    return z[..., _PAD : _PAD + _N]


@functools.lru_cache(maxsize=None)
def _bpf_half() -> np.ndarray:
    nfft = C.ANALYTIC_NFFT
    df = C.SAMPLE_RATE / nfft
    f = np.arange(nfft // 2) * df - C.ANALYTIC_BPF_CENTER
    t = 1.0 / C.ANALYTIC_BPF_WIDTH
    beta = C.ANALYTIC_BPF_BETA
    lo = (1 - beta) / (2 * t)
    hi = (1 + beta) / (2 * t)
    h = np.ones(nfft // 2)
    af = np.abs(f)
    trans = (af > lo) & (af <= hi)
    h[trans] = 0.5 * (1.0 + np.cos((np.pi * t / beta) * (af[trans] - lo)))
    h[af > hi] = 0.0
    full = np.zeros(nfft)
    full[: nfft // 2] = h
    full[0] *= 0.5
    return full.astype(np.float32)


def analytic_method1(x: jnp.ndarray) -> jnp.ndarray:
    """Real (..., 5184) samples -> analytic signal via zero-padded 8192-pt FFT.

    The spectrum mask folds in the reference's band filter, half-DC, and
    negative-frequency zeroing; the unnormalized cuFFT inverse becomes
    ifft * nfft.
    """
    nfft = C.ANALYTIC_NFFT
    pad_cfg = [(0, 0)] * (x.ndim - 1) + [(0, nfft - _N)]
    xx = jnp.pad(x.astype(jnp.float32) * (2.0 / nfft), pad_cfg)
    X = jnp.fft.fft(xx.astype(jnp.complex64), axis=-1)
    X = X * jnp.asarray(_bpf_half())
    out = jnp.fft.ifft(X, axis=-1) * nfft
    return out[..., :_N].astype(jnp.complex64)


def rms_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """fac = 1/rms over each window (main.cu:301-307)."""
    x = x.astype(jnp.float32)
    rms = jnp.sqrt(jnp.mean(x * x, axis=-1, keepdims=True))
    return x / jnp.maximum(rms, 1e-30)
