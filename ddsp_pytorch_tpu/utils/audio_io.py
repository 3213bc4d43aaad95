"""Wav IO without librosa/soundfile: scipy.io.wavfile + polyphase resampling.

Role parity: the reference loads audio with librosa.load(sample_rate)
(preprocess.py:21) which decodes and resamples; here scipy reads the file and
scipy.signal.resample_poly converts the rate.
"""

from __future__ import annotations

import numpy as np
from scipy.io import wavfile
from scipy.signal import resample_poly


def load_wav(path: str, sample_rate: int | None = None) -> tuple:
    """Read a wav as float32 in [-1, 1], mono-mixed, optionally resampled.

    Returns (audio (T,), sample_rate).
    """
    sr, data = wavfile.read(path)
    if data.dtype == np.int16:
        audio = data.astype(np.float32) / 32768.0
    elif data.dtype == np.int32:
        audio = data.astype(np.float32) / 2147483648.0
    elif data.dtype == np.uint8:
        audio = (data.astype(np.float32) - 128.0) / 128.0
    else:
        audio = data.astype(np.float32)
    if audio.ndim > 1:
        audio = audio.mean(axis=1)
    if sample_rate is not None and sr != sample_rate:
        g = np.gcd(int(sample_rate), int(sr))
        audio = resample_poly(audio, sample_rate // g, sr // g).astype(np.float32)
        sr = sample_rate
    return audio, sr


def save_wav(path: str, audio: np.ndarray, sample_rate: int) -> None:
    """Write float32 audio in [-1, 1] as 16-bit PCM."""
    audio = np.asarray(audio, np.float32)
    clipped = np.clip(audio, -1.0, 1.0)
    wavfile.write(path, sample_rate, (clipped * 32767.0).astype(np.int16))
