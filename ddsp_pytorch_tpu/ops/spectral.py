"""Spectral ops: STFT, multi-scale magnitude STFT, mel / MFCC.

Behavioral parity targets:

  multiscale_fft   reference ddsp/core.py:27-41 (torch.stft, center=True,
                   reflect pad, periodic Hann, normalized=True → × n_fft^-1/2)
  mfcc             reference ddsp/preprocess.py:30-32 (librosa.feature.mfcc:
                   power mel spectrogram, Slaney mel filterbank, power_to_db
                   with top_db=80, orthonormal DCT-II, first n_mfcc coeffs)

The reference computes the STFT on GPU via cuFFT; here framing is an XLA
gather + batched rfft, which XLA lowers to efficient TPU FFTs.  All mel/DCT
projections are plain matmuls → MXU.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def hann_window(n: int, dtype=jnp.float32) -> jax.Array:
    """Periodic Hann window (torch.hann_window / scipy 'hann' periodic)."""
    i = jnp.arange(n, dtype=dtype)
    return 0.5 * (1.0 - jnp.cos(2.0 * jnp.pi * i / n))


def frame_signal(
    signal: jax.Array, frame_length: int, hop_length: int
) -> jax.Array:
    """Slice (..., T) into overlapping frames (..., n_frames, frame_length).

    n_frames = 1 + (T - frame_length) // hop_length.  Implemented as a gather
    with a static index matrix — XLA folds this into the FFT's input layout.
    """
    t = signal.shape[-1]
    n_frames = 1 + (t - frame_length) // hop_length
    idx = (
        np.arange(n_frames)[:, None] * hop_length + np.arange(frame_length)[None, :]
    )
    return signal[..., idx]


def stft(
    signal: jax.Array,
    n_fft: int,
    hop_length: int,
    *,
    center: bool = True,
    pad_mode: str = "reflect",
    normalized: bool = True,
    magnitude: bool = True,
) -> jax.Array:
    """STFT matching torch.stft semantics used by the reference loss.

    Args:
      signal: (..., T) real signal.
    Returns:
      (..., n_fft//2 + 1, n_frames) magnitude (or complex if magnitude=False),
      torch.stft's (freq, frames) layout.
    """
    dtype = signal.dtype
    if center:
        pad = n_fft // 2
        pad_widths = [(0, 0)] * (signal.ndim - 1) + [(pad, pad)]
        signal = jnp.pad(signal, pad_widths, mode=pad_mode)
    frames = frame_signal(signal, n_fft, hop_length)
    frames = frames * hann_window(n_fft, dtype=dtype)
    spec = jnp.fft.rfft(frames, axis=-1)
    if normalized:
        # torch.stft(normalized=True) scales by win_length^-0.5 (= n_fft here).
        spec = spec * (1.0 / np.sqrt(n_fft))
    spec = jnp.swapaxes(spec, -1, -2)  # (..., bins, frames)
    if magnitude:
        return jnp.abs(spec)
    return spec


def multiscale_fft(
    signal: jax.Array, scales: Sequence[int], overlap: float
) -> List[jax.Array]:
    """Magnitude STFTs at each FFT size in `scales`, hop = s*(1-overlap).

    Backbone of the multi-scale spectral loss (reference core.py:27-41).
    """
    return [
        stft(signal, s, int(s * (1.0 - overlap)), magnitude=True) for s in scales
    ]


# --------------------------------------------------------------------- mel


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False): linear below 1 kHz, log above."""
    f = np.asanyarray(f, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    mel = f / f_sp
    log_region = f >= min_log_hz
    mel = np.where(
        log_region,
        min_log_mel + np.log(np.maximum(f, min_log_hz) / min_log_hz) / logstep,
        mel,
    )
    return mel


def _mel_to_hz_slaney(mel: np.ndarray) -> np.ndarray:
    mel = np.asanyarray(mel, dtype=np.float64)
    f_sp = 200.0 / 3.0
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f = mel * f_sp
    log_region = mel >= min_log_mel
    f = np.where(log_region, min_log_hz * np.exp(logstep * (mel - min_log_mel)), f)
    return f


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, (n_mels, 1 + n_fft//2).

    Matches librosa.filters.mel(htk=False, norm='slaney'), the filterbank
    underneath the reference's MFCC features (preprocess.py:30-32).
    """
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(np.array(fmin)), _hz_to_mel_slaney(np.array(fmax)), n_mels + 2
    )
    mel_f = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization.
    enorm = 2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=None)
def dct_matrix(n_out: int, n_in: int) -> np.ndarray:
    """Orthonormal DCT-II matrix (n_out, n_in): y = M @ x.

    Matches scipy.fftpack.dct(type=2, norm='ortho') truncated to n_out rows,
    as used by librosa.feature.mfcc.
    """
    k = np.arange(n_out)[:, None]
    n = np.arange(n_in)[None, :]
    mat = 2.0 * np.cos(np.pi * k * (2.0 * n + 1.0) / (2.0 * n_in))
    # ortho normalization
    mat *= np.sqrt(1.0 / (4.0 * n_in))
    mat[0] *= np.sqrt(0.5)
    mat *= np.sqrt(2.0)
    return mat.astype(np.float32)


def power_to_db(
    s: jax.Array,
    amin: float = 1e-10,
    top_db: float = 80.0,
    ref_db: float | None = None,
) -> jax.Array:
    """10*log10(max(amin, s)) clipped to (ref - top_db), librosa semantics.

    With ref_db=None the clip reference is the max over the whole (per-signal)
    spectrogram — the last two axes of (..., mels, frames) — matching per-file
    librosa behavior.  That reference is *anti-causal* (it depends on future
    frames), so streaming consumers (StreamingMFCC) pass a fixed ref_db
    instead; offline callers may pass the same value to get the exact same
    floor.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(amin, s))
    if top_db is not None:
        if ref_db is None:
            ref = jnp.max(log_spec, axis=(-2, -1), keepdims=True)
        else:
            ref = jnp.asarray(ref_db, log_spec.dtype)
        log_spec = jnp.maximum(log_spec, ref - top_db)
    return log_spec


def amplitude_to_db(s: jax.Array, amin: float = 1e-5, top_db: float = 80.0):
    """librosa.amplitude_to_db: power_to_db of S**2 (used by plots)."""
    return power_to_db(jnp.square(s), amin=amin * amin, top_db=top_db)


def stft_to_mel(stft_mag: jax.Array, sample_rate: int, n_fft: int) -> jax.Array:
    """Mel spectrogram from a magnitude STFT, reference semantics
    (utils.py:49-50): librosa.feature.melspectrogram(S=...) uses the given
    spectrogram AS-IS — no power exponent is applied when S is provided —
    so the magnitudes project straight through the mel filterbank.  (The
    reconstruction reports' dB scale matches the reference's figures.)"""
    fb = jnp.asarray(
        mel_filterbank(sample_rate, n_fft, 128, 0.0, sample_rate / 2.0)
    )
    return jnp.einsum("mf,...ft->...mt", fb, stft_mag)


def mfcc(
    signal: jax.Array,
    sample_rate: int,
    *,
    n_mfcc: int = 30,
    n_fft: int = 1024,
    hop_length: int = 512,
    fmin: float = 20.0,
    fmax: float = 8000.0,
    n_mels: int = 128,
    ref_db: float | None = None,
) -> jax.Array:
    """MFCCs matching librosa.feature.mfcc as called by the reference
    (preprocess.py:30-32).  (..., T) → (..., n_frames, n_mfcc).

    Pipeline: power spectrogram (center reflect pad, periodic Hann, not
    normalized) → Slaney mel filterbank → power_to_db(top_db=80) →
    orthonormal DCT-II → first n_mfcc coefficients.

    ref_db: fixed dB floor reference for power_to_db (None → librosa's global
    spectrogram max).  Pass a fixed value to match StreamingMFCC exactly.
    """
    spec = stft(
        signal, n_fft, hop_length, center=True, normalized=False, magnitude=True
    )
    power = jnp.square(spec)  # (..., bins, frames)
    fb = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax))
    mel = jnp.einsum("mf,...ft->...mt", fb, power)
    mel_db = power_to_db(mel, amin=1e-10, top_db=80.0, ref_db=ref_db)
    dct = jnp.asarray(dct_matrix(n_mfcc, n_mels))
    out = jnp.einsum("cm,...mt->...ct", dct, mel_db)
    return jnp.swapaxes(out, -1, -2)  # (..., frames, n_mfcc)
