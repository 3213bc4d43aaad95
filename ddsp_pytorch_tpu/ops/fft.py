"""Real FFTs with explicit custom VJPs (shard_map/vma-clean).

Why this exists: jax 0.9's built-in fft transpose rule drops the varying-
mesh-axes (vma) annotation on cotangents, so differentiating `jnp.fft.rfft`
/ `jnp.fft.irfft` inside a `shard_map` with the replication check on fails
with "cotangent type does not match function output".  The time-sharded
training step (training/time_sharded.py) differentiates through FFTs inside
shard_map — the sharded multiscale loss, the halo'd reverb convolution, and
the frame-wise noise FIR all live there — so these wrappers define the
adjoints as *forward* FFT calls via jax.custom_vjp; bwd is traced like any
other code and the vma machinery stays intact (and the check stays ON).

The adjoints are exact (not approximations):

  rfft:  x real (n) → y complex (m = n//2+1).  With JAX's convention for
         gradients of real losses w.r.t. complex values (grad = ∂L/∂Re −
         i·∂L/∂Im), the pullback of a cotangent ct is
             grad_x = Re( n · ifft( conj(ct) zero-padded to n ) ).
  irfft: z complex (m) → y real (n).  Pullback of real ct is
             g = conj( rfft(ct) ) · 2/n, with the DC bin (and the Nyquist
             bin for even n) scaled by 1/n instead of 2/n — those bins
             appear once in the Hermitian expansion, interior bins twice.

Both are pinned against the built-in gradients in tests/test_fft_vjp.py
(forward bit-identical, gradients to f32 exactness).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_RFFT_CACHE: dict = {}
_IRFFT_CACHE: dict = {}


def _make_rfft(n: int):
    @jax.custom_vjp
    def f(x):
        return jnp.fft.rfft(x, n)

    def fwd(x):
        return jnp.fft.rfft(x, n), None

    def bwd(_, ct):
        m = ct.shape[-1]
        pad = [(0, 0)] * (ct.ndim - 1) + [(0, n - m)]
        g = jnp.real(jnp.fft.ifft(jnp.conj(jnp.pad(ct, pad)))) * n
        return (g,)

    f.defvjp(fwd, bwd)
    return f


def _make_irfft(n: int):
    @jax.custom_vjp
    def f(z):
        return jnp.fft.irfft(z, n)

    def fwd(z):
        return jnp.fft.irfft(z, n), None

    def bwd(_, ct):
        g = jnp.conj(jnp.fft.rfft(ct)) * (2.0 / n)
        g = g.at[..., 0].multiply(0.5)
        if n % 2 == 0:
            g = g.at[..., -1].multiply(0.5)
        return (g,)

    f.defvjp(fwd, bwd)
    return f


def rfft(x: jax.Array, n: int | None = None) -> jax.Array:
    """jnp.fft.rfft(x, n) with a shard_map-safe VJP (see module docstring).

    Padding/truncation to `n` happens OUTSIDE the custom-vjp core (pad/slice
    have clean transposes), so the cached kernels are keyed by the final
    length only.
    """
    x_len = x.shape[-1]
    if n is None:
        n = x_len
    if n > x_len:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, n - x_len)])
    elif n < x_len:
        x = x[..., :n]
    f = _RFFT_CACHE.get(n)
    if f is None:
        f = _RFFT_CACHE[n] = _make_rfft(n)
    return f(x)


def irfft(z: jax.Array, n: int | None = None) -> jax.Array:
    """jnp.fft.irfft(z, n) with a shard_map-safe VJP.

    Requires the spectrum to already have n//2+1 bins (every in-repo caller
    does — the general pad/truncate-the-spectrum semantics of the built-in
    are deliberately not replicated).
    """
    m = z.shape[-1]
    if n is None:
        n = 2 * (m - 1)
    if m != n // 2 + 1:
        raise ValueError(
            f"irfft: spectrum has {m} bins, expected n//2+1 = {n // 2 + 1}"
        )
    f = _IRFFT_CACHE.get(n)
    if f is None:
        f = _IRFFT_CACHE[n] = _make_irfft(n)
    return f(z)
