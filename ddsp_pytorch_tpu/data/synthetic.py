"""Synthetic harmonic-tone dataset with known ground-truth controls.

No reference analogue (the reference has no tests, SURVEY.md §4); this is the
fixture backbone: audio rendered by the framework's own oscillator from known
f0/amplitude trajectories, so integration tests can (a) skip the pitch
tracker and (b) assert that training actually reduces spectral loss against
a reachable target (SURVEY.md §4 recommendation #3).
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np

import jax.numpy as jnp

from ddsp_pytorch_tpu.ops import (
    extract_loudness,
    harmonic_synth_frames,
    mfcc as mfcc_op,
)


def make_synthetic_dataset(
    out_dir: str,
    *,
    n_items: int = 8,
    sample_rate: int = 16000,
    signal_length: int = 16384,
    block_size: int = 256,
    n_harmonic: int = 8,
    n_mfcc: int = 30,
    seed: int = 0,
    partitions=("train", "validation"),
) -> Dict[str, np.ndarray]:
    """Write a preprocess-compatible .npy cache of synthetic tones.

    Each item is a harmonic tone with a random slowly-varying f0 in
    [150, 400] Hz and a random amplitude envelope.  Returns the last
    partition's arrays for convenience.
    """
    f = signal_length // block_size
    rng = np.random.default_rng(seed)
    out = {}
    for p_i, partition in enumerate(partitions):
        sigs, pitches, louds, mfccs = [], [], [], []
        for i in range(n_items):
            base = rng.uniform(150.0, 400.0)
            wobble = rng.uniform(0.0, 0.03)
            f0 = base * (
                1.0 + wobble * np.sin(2 * np.pi * rng.uniform(0.3, 2.0) *
                                      np.arange(f) * block_size / sample_rate)
            ).astype(np.float32)
            env = 0.5 * (0.4 + 0.6 * rng.random()) * np.hanning(f).astype(np.float32)
            dist = rng.random(n_harmonic).astype(np.float32)
            dist /= dist.sum()
            amps = env[:, None] * dist[None, :]
            audio = np.asarray(
                harmonic_synth_frames(
                    jnp.asarray(f0[None]),
                    jnp.asarray(amps[None]),
                    block_size,
                    sample_rate,
                    use_pallas="never",
                )
            )[0].astype(np.float32)
            loud = np.asarray(
                extract_loudness(jnp.asarray(audio[None]), sample_rate, block_size)
            )[0].astype(np.float32)
            mf = np.asarray(
                mfcc_op(
                    jnp.asarray(audio[None]),
                    sample_rate,
                    n_mfcc=n_mfcc,
                    n_fft=1024,
                    hop_length=block_size,
                )
            )[0].astype(np.float32)
            sigs.append(audio)
            pitches.append(f0)
            louds.append(loud)
            mfccs.append(mf)

        pdir = os.path.join(out_dir, partition)
        os.makedirs(pdir, exist_ok=True)
        arrays = {
            "signals": np.stack(sigs),
            "pitchs": np.stack(pitches),
            "loudness": np.stack(louds),
            "mfccs": np.stack(mfccs),
        }
        for name, arr in arrays.items():
            np.save(os.path.join(pdir, f"{name}.npy"), arr)
        out = arrays
    return out
