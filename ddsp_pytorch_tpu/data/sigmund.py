"""Ingest Pd/sigmund~-preprocessed 3-channel wavs.

Parity: reference preprocess_from_sigmund.py:10-44 — a Pure Data patch
(patches/preprocess.pd) records a 3-channel wav: ch0 = audio, ch1 = pitch
(sigmund~ → mtof, Hz), ch2 = loudness, both low-passed at 1 kHz.  This
ingests such a file: chunk to signal_length, decimate the pitch/loudness
channels by block_size, save the .npy cache.  (This is how the reference's
pretrained sax/violin models were preprocessed — README.md:46-49.)
"""

from __future__ import annotations

from os import makedirs, path

import numpy as np
from scipy.io import wavfile

from ddsp_pytorch_tpu.config import Config


def preprocess_from_sigmund(
    wav_path: str, config: Config, partition: str | None = None
) -> None:
    sr, x = wavfile.read(wav_path)
    pc = config.preprocess
    assert sr == pc.sample_rate, f"wav rate {sr} != config {pc.sample_rate}"
    assert x.ndim == 2 and x.shape[1] >= 3, "need a 3-channel sigmund wav"
    if x.dtype == np.int16:
        x = x.astype(np.float32) / 32768.0
    elif x.dtype == np.int32:
        x = x.astype(np.float32) / 2147483648.0
    else:
        x = x.astype(np.float32)

    n_signal = pc.signal_length
    pad = (n_signal - (x.shape[0] % n_signal)) % n_signal
    x = np.pad(x, ((0, pad), (0, 0)))

    # (T, C) → (C, n_chunks, n_signal)
    chans = x.T.reshape(x.shape[1], -1, n_signal)

    out_dir = pc.out_dir if partition is None else path.join(pc.out_dir, partition)
    makedirs(out_dir, exist_ok=True)
    np.save(path.join(out_dir, "signals.npy"), chans[0])
    np.save(path.join(out_dir, "pitchs.npy"), chans[1, :, :: pc.block_size])
    np.save(path.join(out_dir, "loudness.npy"), chans[2, :, :: pc.block_size])
