"""Circular correlation (the HolE pair scorer hot op).

Semantics (reference: models/link_prediction/hole.py:69-91):
``ifft(conj(fft(a)) * fft(b)).real`` — the reference implements it with
explicit real/imag FFT pairs because Chainer lacked complex support.

TPU mapping: real-input FFTs via ``jnp.fft.rfft`` halve the spectrum work
and XLA lowers them natively; for the typical feature dims here (<= a few
hundred) the op is trivially memory-bound and fuses with the surrounding
head MLP.  A time-domain formulation is also provided: for dim D the
correlation equals ``corr[k] = sum_d a[d] * b[(d + k) mod D]`` which is a
(D, D) matmul against a rolled copy of ``b`` — on TPU this hits the MXU
and avoids FFT entirely; it wins for small D and large batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def circular_correlation(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """corr(a, b)[..., k] = sum_d a[..., d] * b[..., (d + k) % D]."""
    fa = jnp.fft.rfft(a.astype(jnp.float32), axis=-1)
    fb = jnp.fft.rfft(b.astype(jnp.float32), axis=-1)
    return jnp.fft.irfft(jnp.conj(fa) * fb, n=a.shape[-1], axis=-1)


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


def circular_correlation_reference(a, b):
    """numpy-style transcription of the reference real/imag FFT math."""
    fa_r, fa_i = jnp.real(jnp.fft.fft(a)), jnp.imag(jnp.fft.fft(a))
    fb_r, fb_i = jnp.real(jnp.fft.fft(b)), jnp.imag(jnp.fft.fft(b))
    prod_r = fa_r * fb_r + fa_i * fb_i
    prod_i = fa_r * fb_i - fa_i * fb_r
    return jnp.real(jnp.fft.ifft(prod_r + 1j * prod_i))
