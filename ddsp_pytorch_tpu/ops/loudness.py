"""A-weighted loudness feature.

Behavioral parity target: reference ddsp/core.py:81-97 (`extract_loudness`):
librosa STFT (hop=block_size, center=True) → log-magnitude → add the IEC
A-weighting curve per frequency bin → mean over bins → drop the last frame.
Implemented in pure JAX (librosa is not a dependency of this framework).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_pytorch_tpu.ops.spectral import stft


def fft_frequencies(sample_rate: float, n_fft: int) -> np.ndarray:
    """Center frequencies of rfft bins: linspace(0, sr/2, 1 + n_fft//2)."""
    return np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)


def a_weighting(frequencies: np.ndarray, min_db: float = -80.0) -> np.ndarray:
    """IEC 61672 A-weighting curve in dB (librosa.A_weighting semantics).

    Computed in float64 numpy (it is a constant table, built once per config).
    The DC bin evaluates to -inf and is clamped at min_db.
    """
    f_sq = np.asanyarray(frequencies, dtype=np.float64) ** 2.0
    const = np.array([12194.217, 20.598997, 107.65265, 737.86223]) ** 2.0
    with np.errstate(divide="ignore"):
        weights = 2.0 + 20.0 * (
            np.log10(const[0])
            + 2.0 * np.log10(np.where(f_sq > 0, f_sq, 1.0))
            + np.where(f_sq > 0, 0.0, -np.inf)
            - np.log10(f_sq + const[0])
            - np.log10(f_sq + const[1])
            - 0.5 * np.log10(f_sq + const[2])
            - 0.5 * np.log10(f_sq + const[3])
        )
    if min_db is not None:
        weights = np.maximum(min_db, weights)
    return weights


def extract_loudness(
    signal: jax.Array,
    sample_rate: int,
    block_size: int,
    n_fft: int = 2048,
) -> jax.Array:
    """Frame-rate A-weighted log-loudness.

    (..., T) → (..., T // block_size) — one frame per block; the STFT yields
    1 + T//hop frames (center=True) and the final frame is dropped, matching
    the reference (core.py:95).
    """
    mag = stft(
        signal,
        n_fft,
        block_size,
        center=True,
        pad_mode="reflect",
        normalized=False,
        magnitude=True,
    )  # (..., bins, frames)
    log_mag = jnp.log(mag + 1e-7)
    weights = jnp.asarray(
        a_weighting(fft_frequencies(sample_rate, n_fft)), dtype=signal.dtype
    )
    weighted = log_mag + weights[..., :, None]
    loud = jnp.mean(weighted, axis=-2)
    return loud[..., :-1]
