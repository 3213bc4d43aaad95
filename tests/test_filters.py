"""Filters: FIR design + fft_convolve vs torch/np oracles (reference
ddsp/core.py:144-175 semantics)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
import torch.fft as tfft

from ddsp_pytorch_tpu.ops import (
    amp_to_impulse_response,
    fft_convolve,
    filtered_noise,
)


def _torch_amp_to_ir(amp, target_size):
    amp = torch.stack([amp, torch.zeros_like(amp)], -1)
    amp = torch.view_as_complex(amp)
    impulse = tfft.irfft(amp)
    filter_size = impulse.shape[-1]
    impulse = torch.roll(impulse, filter_size // 2, -1)
    win = torch.hann_window(filter_size, dtype=impulse.dtype)
    impulse = impulse * win
    impulse = F.pad(impulse, (0, int(target_size) - int(filter_size)))
    impulse = torch.roll(impulse, -filter_size // 2, -1)
    return impulse


def _torch_fft_convolve(signal, kernel):
    signal = F.pad(signal, (0, signal.shape[-1]))
    kernel = F.pad(kernel, (kernel.shape[-1], 0))
    output = tfft.irfft(tfft.rfft(signal) * tfft.rfft(kernel))
    return output[..., output.shape[-1] // 2:]


def test_amp_to_impulse_response_matches_torch(rng):
    amp = rng.random((3, 5, 33)).astype(np.float32)
    got = amp_to_impulse_response(jnp.asarray(amp), 128)
    want = _torch_amp_to_ir(torch.tensor(amp), 128).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_impulse_response_is_even_before_window(rng):
    """Zero-phase design: irfft of a real spectrum is even; after center
    roll + Hann the response is symmetric around filter_size//2."""
    amp = rng.random((1, 17)).astype(np.float32)
    ir = np.asarray(amp_to_impulse_response(jnp.asarray(amp), 64))[0]
    n = 32  # filter_size = 2*(17-1)
    centered = np.roll(ir, n // 2)[:n]
    np.testing.assert_allclose(centered[1:], centered[1:][::-1], atol=1e-5)


def test_fft_convolve_matches_torch(rng):
    sig = rng.standard_normal((2, 4, 256)).astype(np.float32)
    ker = rng.standard_normal((2, 4, 256)).astype(np.float32)
    got = fft_convolve(jnp.asarray(sig), jnp.asarray(ker))
    want = _torch_fft_convolve(torch.tensor(sig), torch.tensor(ker)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_fft_convolve_identity_kernel(rng):
    """Kernel = centered delta reproduces the signal (delay compensated)."""
    n = 128
    sig = rng.standard_normal((1, n)).astype(np.float32)
    ker = np.zeros((1, n), np.float32)
    ker[0, 0] = 1.0  # delta at 0 → output = signal (half-keep removes delay)
    out = np.asarray(fft_convolve(jnp.asarray(sig), jnp.asarray(ker)))
    np.testing.assert_allclose(out, sig, atol=1e-4)


def test_fft_convolve_is_causal_linear_convolution(rng):
    """fft_convolve's half-keep implements a causal linear convolution with
    the stored kernel: out[t] = Σ_{τ≤t} ker[τ]·x[t−τ].  (This is the exact
    semantics the Reverb relies on, and what the time-sharded overlap-
    scatter convolution in parallel/ops.py reproduces.)"""
    n = 64
    sig = rng.standard_normal((n,)).astype(np.float32)
    fir = rng.standard_normal((9,)).astype(np.float32)
    ker = np.zeros((n,), np.float32)
    ker[:9] = fir  # purely causal kernel, no wrapped taps
    got = np.asarray(fft_convolve(jnp.asarray(sig[None]), jnp.asarray(ker[None])))[0]
    want = np.convolve(sig, fir, mode="full")[:n]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_filtered_noise_shape_and_injection(rng):
    b, f, bands, block = 2, 10, 65, 512
    mags = jnp.asarray(rng.random((b, f, bands)).astype(np.float32))
    noise = jnp.asarray(rng.uniform(-1, 1, (b, f, block)).astype(np.float32))
    out = filtered_noise(mags, block, jax.random.key(0), noise=noise)
    assert out.shape == (b, f * block)

    # oracle: frame-wise torch pipeline
    ir = _torch_amp_to_ir(torch.tensor(np.asarray(mags)), block)
    want = _torch_fft_convolve(torch.tensor(np.asarray(noise)), ir)
    want = want.reshape(b, -1).numpy()
    np.testing.assert_allclose(out, want, rtol=1e-3, atol=1e-4)


def test_filtered_noise_rng_reproducible(rng):
    mags = jnp.asarray(rng.random((1, 4, 17)).astype(np.float32))
    k = jax.random.key(42)
    out1 = filtered_noise(mags, 64, k)
    out2 = filtered_noise(mags, 64, k)
    np.testing.assert_allclose(out1, out2)


def test_filtered_noise_spectrum_follows_magnitudes(rng):
    """Low-pass magnitudes → output has little high-frequency energy."""
    b, f, bands, block = 1, 64, 129, 512
    mags = np.zeros((b, f, bands), np.float32)
    mags[..., :32] = 1.0  # keep only the lowest quarter of the band
    out = np.asarray(
        filtered_noise(jnp.asarray(mags), block, jax.random.key(0))
    )[0]
    spec = np.abs(np.fft.rfft(out))
    n = len(spec)
    low = spec[: n // 5].mean()
    high = spec[n // 2 :].mean()  # well into the stopband
    # The frame-wise design joins 512-sample frames with no crossfade
    # (reference modules.py:126 semantics), which splatters broadband energy
    # at frame boundaries — the stopband floor is ~-13 dB by construction.
    assert high < 0.3 * low
