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

# Instrument presets for pretrained-artifact training (reference ships
# pretrained saxophone + violin models, README.md:46-49; with no audio data
# in-container, ours are trained on these synthetic instrument families).
# Fields: f0 range (Hz), spectral rolloff α range (amp_k ∝ k^-α, slowly
# time-varying), vibrato rate (Hz) / depth (fractional), breath-noise level,
# attack/release fraction of the note envelope.
INSTRUMENTS = {
    "tone": None,  # legacy random-tone behavior
    "violin": dict(
        f0=(196.0, 880.0), rolloff=(0.8, 1.6), vib_hz=(5.0, 7.0),
        vib_depth=(0.004, 0.012), breath=0.0008, attack=0.10, release=0.15,
    ),
    "sax": dict(
        f0=(116.0, 500.0), rolloff=(0.5, 1.1), vib_hz=(4.0, 6.0),
        vib_depth=(0.002, 0.006), breath=0.003, attack=0.05, release=0.10,
    ),
    "flute": dict(
        f0=(262.0, 1568.0), rolloff=(2.0, 3.2), vib_hz=(4.5, 6.5),
        vib_depth=(0.003, 0.009), breath=0.008, attack=0.08, release=0.12,
    ),
}


def _instrument_item(rng, preset, f, block_size, sample_rate, n_harmonic):
    """One note: (f0 (F,), amps (F, K), breath_level) from a preset."""
    tf = np.arange(f) * block_size / sample_rate  # frame times, s
    base = np.exp(rng.uniform(np.log(preset["f0"][0]), np.log(preset["f0"][1])))
    vib_hz = rng.uniform(*preset["vib_hz"])
    vib_depth = rng.uniform(*preset["vib_depth"])
    # vibrato fades in over the first third of the note
    vib_env = np.clip(tf / max(tf[-1] / 3.0, 1e-6), 0.0, 1.0)
    f0 = (
        base * (1.0 + vib_depth * vib_env * np.sin(2 * np.pi * vib_hz * tf))
    ).astype(np.float32)

    # slowly time-varying spectral rolloff (bow pressure / embouchure drift)
    a0, a1 = rng.uniform(*preset["rolloff"]), rng.uniform(*preset["rolloff"])
    alpha = np.linspace(a0, a1, f, dtype=np.float32)[:, None]
    k = np.arange(1, n_harmonic + 1, dtype=np.float32)[None, :]
    dist = k ** (-alpha)
    # one soft formant bump at a random harmonic region
    center = rng.uniform(2.0, min(12.0, n_harmonic))
    width = rng.uniform(1.0, 3.0)
    dist = dist * (1.0 + 1.5 * np.exp(-0.5 * ((k - center) / width) ** 2))
    dist /= dist.sum(axis=-1, keepdims=True)

    # attack / sustain / release envelope with gentle amplitude drift
    att = max(int(preset["attack"] * f), 1)
    rel = max(int(preset["release"] * f), 1)
    env = np.ones(f, dtype=np.float32)
    env[:att] = np.linspace(0.0, 1.0, att, dtype=np.float32)
    env[f - rel:] = np.linspace(1.0, 0.0, rel, dtype=np.float32)
    drift = 1.0 + 0.1 * np.sin(
        2 * np.pi * rng.uniform(0.2, 0.8) * tf + rng.uniform(0, 2 * np.pi)
    )
    level = 0.3 + 0.4 * rng.random()
    amps = (level * env * drift).astype(np.float32)[:, None] * dist
    return f0, amps.astype(np.float32), preset["breath"]


def make_synthetic_dataset(
    out_dir: str,
    *,
    n_items: int = 8,
    sample_rate: int = 16000,
    signal_length: int = 16384,
    block_size: int = 256,
    n_harmonic: int = 8,
    n_mfcc: int = 30,
    mfcc_n_fft: int = 1024,
    n_mels: int = 128,
    mfcc_ref_db: float | None = None,
    seed: int = 0,
    partitions=("train", "validation"),
    instrument: str = "tone",
) -> Dict[str, np.ndarray]:
    """Write a preprocess-compatible .npy cache of synthetic tones.

    With the default ``instrument='tone'`` each item is a harmonic tone with
    a random slowly-varying f0 in [150, 400] Hz and a random amplitude
    envelope.  Named presets from ``INSTRUMENTS`` ('violin', 'sax', 'flute')
    instead render instrument-like notes — vibrato, time-varying spectral
    rolloff + formant, attack/release envelope, breath noise — used to train
    the committed pretrained bundles.  Returns the last partition's arrays.
    """
    f = signal_length // block_size
    rng = np.random.default_rng(seed)
    preset = INSTRUMENTS[instrument]
    out = {}
    for p_i, partition in enumerate(partitions):
        sigs, pitches, louds, mfccs = [], [], [], []
        for i in range(n_items):
            breath = 0.0
            if preset is not None:
                f0, amps, breath = _instrument_item(
                    rng, preset, f, block_size, sample_rate, n_harmonic
                )
                # drop partials above Nyquist at the note's highest f0
                k = np.arange(1, n_harmonic + 1)
                amps = amps * (k[None, :] * f0[:, None] < sample_rate / 2)
            else:
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
            if breath:
                level = breath * np.interp(
                    np.arange(len(audio)),
                    np.arange(f) * block_size,
                    amps.sum(-1) / max(np.max(amps.sum(-1)), 1e-6),
                )
                audio = audio + (
                    level * rng.standard_normal(len(audio))
                ).astype(np.float32)
            loud = np.asarray(
                extract_loudness(jnp.asarray(audio[None]), sample_rate, block_size)
            )[0].astype(np.float32)
            mf = np.asarray(
                mfcc_op(
                    jnp.asarray(audio[None]),
                    sample_rate,
                    n_mfcc=n_mfcc,
                    n_fft=mfcc_n_fft,
                    hop_length=block_size,
                    n_mels=n_mels,
                    ref_db=mfcc_ref_db,
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
