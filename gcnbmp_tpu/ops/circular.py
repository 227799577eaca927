"""Circular correlation (the HolE pair scorer hot op).

Semantics (reference: models/link_prediction/hole.py:69-91):
``ifft(conj(fft(a)) * fft(b)).real`` — the reference implements it with
explicit real/imag FFT pairs because Chainer lacked complex support.

TPU mapping: real-input FFTs via ``jnp.fft.rfft`` halve the spectrum work
and XLA lowers them natively.  A time-domain formulation is also
provided: for dim D the correlation equals
``corr[k] = sum_d a[d] * b[(d + k) mod D]`` — a (D, D) matmul against a
rolled copy of ``b`` that hits the MXU and avoids FFT entirely.

Measured on the v5e (fwd+bwd, B=2048, docs/SWEEPS_r02.jsonl 'circ'):
matmul 373 us vs rfft 478 us at D=16; rfft wins from D=32 up (346 vs
404 us at D=32; 312 vs 1661 us at D=128 — the O(D^2) gather-built
circulant loses).  ``circular_correlation_auto`` dispatches on that
boundary; either way the op is dispatch-latency-bound at these sizes
(~0.3 ms against a 4.6 ms train step when fused into it: negligible).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# measured crossover (v5e): time-domain matmul wins below this D
MATMUL_MAX_D = 16


def _corr_raw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    fa = jnp.fft.rfft(a.astype(jnp.float32), axis=-1)
    fb = jnp.fft.rfft(b.astype(jnp.float32), axis=-1)
    return jnp.fft.irfft(jnp.conj(fa) * fb, n=a.shape[-1], axis=-1)


def _conv_raw(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Circular convolution conv(a, b)[..., j] = sum_k a[k] b[(j-k)%D]."""
    fa = jnp.fft.rfft(a.astype(jnp.float32), axis=-1)
    fb = jnp.fft.rfft(b.astype(jnp.float32), axis=-1)
    return jnp.fft.irfft(fa * fb, n=a.shape[-1], axis=-1)


@jax.custom_vjp
def circular_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """corr(a, b)[..., k] = sum_d a[..., d] * b[..., (d + k) % D].

    Ships a closed-form REAL-valued VJP: the adjoints of circular
    correlation are themselves circular ops —
    ``grad_a = corr(g, b)`` and ``grad_b = conv(g, a)`` — so the
    backward never transposes an FFT (complex cotangents through
    rfft/irfft break shard_map's varying-axis checking, and the
    forward-mode-only FFTs here are also cheaper than AD's complex
    intermediate chain)."""
    return _corr_raw(a, b)


def _corr_fwd(a, b):
    return _corr_raw(a, b), (a, b)


def _corr_bwd(res, g):
    a, b = res
    # corr(a,b)[k] = sum_d a[d] b[(d+k)];  dL/da[d] = sum_k g[k] b[(d+k)]
    # = corr(g, b)[d];  dL/db[j] = sum_k g[k] a[(j-k)] = conv(g, a)[j]
    return (_corr_raw(g, b).astype(a.dtype),
            _conv_raw(g, a).astype(b.dtype))


circular_correlation.defvjp(_corr_fwd, _corr_bwd)


def circular_correlation_matmul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """MXU-friendly time-domain form (identical math, O(D^2) flops).

    Builds the circulant matrix of ``b`` once per row:
    ``C[d, k] = b[(d + k) % D]``; then ``corr = a @ C`` — for small D
    (16-128 as used by the DDI heads) the flops are negligible and the
    matmul fuses into the batch dimension on the MXU.
    """
    d = a.shape[-1]
    idx = (jnp.arange(d)[:, None] + jnp.arange(d)[None, :]) % d
    circ = b[..., idx]  # (..., D, D)
    return jnp.einsum("...d,...dk->...k", a, circ)


def circular_correlation_auto(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Form dispatch on the measured v5e crossover: the MXU circulant
    matmul for D <= 16, rfft otherwise (numbers in the module docstring).
    Static shape -> the branch resolves at trace time."""
    if a.shape[-1] <= MATMUL_MAX_D:
        return circular_correlation_matmul(a, b)
    return circular_correlation(a, b)


def circular_correlation_reference(a, b):
    """numpy-style transcription of the reference real/imag FFT math."""
    fa_r, fa_i = jnp.real(jnp.fft.fft(a)), jnp.imag(jnp.fft.fft(a))
    fb_r, fb_i = jnp.real(jnp.fft.fft(b)), jnp.imag(jnp.fft.fft(b))
    prod_r = fa_r * fb_r + fa_i * fb_i
    prod_i = fa_r * fb_i - fa_i * fb_r
    return jnp.real(jnp.fft.ifft(prod_r + 1j * prod_i))
