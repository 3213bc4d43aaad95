"""Offline preprocessing: wav files → .npy feature cache.

Parity: reference ddsp/preprocess.py — load at sample_rate, pad to a multiple
of signal_length (or crop to one chunk if oneshot), extract pitch +
A-weighted loudness + 30 MFCCs, chunk and save
{signals,pitchs,loudness,mfccs}.npy per partition.

Intent fixes vs. the reference (SURVEY.md §2.8.4): MFCCs are computed and
saved *per chunk* (the reference stacks per-file MFCCs while chunking
signals, which only lines up when every file is exactly one chunk).

Pitch runs on-device (JAX YIN+Viterbi, ops/pitch.py) instead of shelling out
to CREPE/TensorFlow; loudness and MFCC are the JAX ops.  Chunks are batched
through jit so TPU preprocessing is one vectorized pass per file.
"""

from __future__ import annotations

import pathlib
from os import makedirs, path
from typing import List

import jax.numpy as jnp
import numpy as np

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.ops import extract_loudness, extract_pitch, mfcc as mfcc_op
from ddsp_pytorch_tpu.utils.audio_io import load_wav


def get_files(data_location, extension: str = "wav") -> List[pathlib.Path]:
    """Recursive glob of audio files by extension (preprocess.py:15-16)."""
    return sorted(pathlib.Path(data_location).rglob(f"*.{extension}"))


def preprocess(
    f,
    sample_rate: int,
    block_size: int,
    signal_length: int,
    oneshot: bool = False,
    pitch_fmin: float = 50.0,
    pitch_fmax: float = 2000.0,
    n_mfcc: int = 30,
    mfcc_n_fft: int = 1024,
    mfcc_fmin: float = 20.0,
    mfcc_fmax: float = 8000.0,
    n_mels: int = 128,
    mfcc_ref_db: float | None = None,
    loudness_n_fft: int = 2048,
    pitch_fn=None,
    **_unused,
):
    """One file → (signals (N, L), pitch (N, F), loudness (N, F),
    mfcc (N, F+1, n_mfcc)) chunk rows.

    pitch_fn: optional (row, sample_rate, block_size) → (F,) f0 override
    (e.g. the trained CREPE-architecture tracker, models/crepe.py); default
    is the YIN+Viterbi tracker.
    """
    x, _ = load_wav(str(f), sample_rate)
    pad = (signal_length - len(x) % signal_length) % signal_length
    x = np.pad(x, (0, pad))
    if oneshot:
        x = x[:signal_length]

    chunks = x.reshape(-1, signal_length)
    xj = jnp.asarray(chunks)

    if pitch_fn is None:
        pitch_fn = lambda row, sr, bs: extract_pitch(  # noqa: E731
            row, sr, bs, fmin=pitch_fmin, fmax=pitch_fmax
        )
    pitch = np.stack(
        [np.asarray(pitch_fn(row, sample_rate, block_size)) for row in xj]
    )
    loudness = np.asarray(
        extract_loudness(xj, sample_rate, block_size, loudness_n_fft)
    )
    mfcc = np.asarray(
        mfcc_op(
            xj,
            sample_rate,
            n_mfcc=n_mfcc,
            n_fft=mfcc_n_fft,
            hop_length=block_size,
            fmin=mfcc_fmin,
            fmax=mfcc_fmax,
            n_mels=n_mels,
            ref_db=mfcc_ref_db,
        )
    )
    return (
        chunks.astype(np.float32),
        pitch.astype(np.float32),
        loudness.astype(np.float32),
        mfcc.astype(np.float32),
    )


def default_crepe_params() -> str | None:
    """Path of the shipped CREPE bundle (pretrained/crepe_tiny.msgpack),
    or None when not present (e.g. an installed package without the
    pretrained/ tree)."""
    shipped = (
        pathlib.Path(__file__).resolve().parents[2]
        / "pretrained"
        / "crepe_tiny.msgpack"
    )
    return str(shipped) if shipped.exists() else None


def make_pitch_fn(config: Config):
    """Pitch-tracker factory from config.preprocess.pitch_tracker.

    "hybrid" (the default) → the CREPE×YIN fused decode
    (models/crepe.py:extract_pitch_hybrid), ≥ either tracker alone across
    the robustness conditions (pretrained/pitch_robustness.json);
    "yin" → None (preprocess uses ops/pitch.py — classical, no weights);
    "crepe" → the trained CREPE-architecture model (models/crepe.py) alone.

    crepe/hybrid load preprocess.crepe_params (saved by
    scripts/train_crepe.py); when unset, the shipped
    pretrained/crepe_tiny.msgpack bundle is used.
    """
    pc = config.preprocess
    tracker = getattr(pc, "pitch_tracker", "hybrid")
    if tracker == "yin":
        return None
    if tracker not in ("crepe", "hybrid"):
        raise ValueError(
            f"unknown pitch_tracker: {tracker!r} (hybrid|yin|crepe)"
        )
    crepe_params = pc.crepe_params or default_crepe_params()
    if crepe_params and not pathlib.Path(crepe_params).exists():
        # frozen bundle configs may record a cwd-relative or training-host
        # path (e.g. "pretrained/crepe_tiny.msgpack"); fall back to the
        # shipped bundle rather than failing timbre transfer
        crepe_params = default_crepe_params()
    if not crepe_params:
        raise ValueError(
            f"pitch_tracker: {tracker} needs preprocess.crepe_params "
            "(train one with scripts/train_crepe.py) — the shipped "
            "pretrained/crepe_tiny.msgpack was not found"
        )
    from flax import serialization

    from ddsp_pytorch_tpu.models.crepe import (
        extract_pitch_crepe,
        extract_pitch_hybrid,
    )

    with open(crepe_params, "rb") as fh:
        bundle = serialization.msgpack_restore(bytearray(fh.read()))

    extract = (extract_pitch_hybrid if tracker == "hybrid"
               else extract_pitch_crepe)

    def pitch_fn(row, sample_rate, block_size):
        # preprocess.pitch_fmin/pitch_fmax bound the search range for the
        # neural trackers too: hybrid restricts its YIN-evidence grid,
        # crepe masks salience bins outside the range (models/crepe.py).
        return extract(
            row, sample_rate, block_size, bundle,
            capacity=pc.crepe_capacity,
            fmin=pc.pitch_fmin, fmax=pc.pitch_fmax,
        )

    return pitch_fn


def preprocess_folder(root_dir, partition: str, config: Config) -> None:
    """Process every file under root_dir/partition into the .npy cache."""
    root_dir = pathlib.Path(root_dir)
    src = root_dir / partition
    assert src.exists(), f"{src} does not exist"
    files = get_files(src, config.data.extension)

    pc = config.preprocess
    pitch_fn = make_pitch_fn(config)
    signals, pitchs, loudness, mfccs = [], [], [], []
    for i, f in enumerate(files):
        print(f"[{i + 1}/{len(files)}] {f}")
        x, p, l, m = preprocess(
            f,
            sample_rate=pc.sample_rate,
            block_size=pc.block_size,
            signal_length=pc.signal_length,
            oneshot=pc.oneshot,
            pitch_fmin=pc.pitch_fmin,
            pitch_fmax=pc.pitch_fmax,
            n_mfcc=pc.n_mfcc,
            mfcc_n_fft=pc.mfcc_n_fft,
            mfcc_fmin=pc.mfcc_fmin,
            mfcc_fmax=pc.mfcc_fmax,
            n_mels=pc.n_mels,
            mfcc_ref_db=pc.mfcc_ref_db,
            loudness_n_fft=pc.loudness_n_fft,
            pitch_fn=pitch_fn,
        )
        signals.append(x)
        pitchs.append(p)
        loudness.append(l)
        mfccs.append(m)

    out_dir = path.join(pc.out_dir, partition)
    makedirs(out_dir, exist_ok=True)
    np.save(path.join(out_dir, "signals.npy"), np.concatenate(signals, 0))
    np.save(path.join(out_dir, "pitchs.npy"), np.concatenate(pitchs, 0))
    np.save(path.join(out_dir, "loudness.npy"), np.concatenate(loudness, 0))
    np.save(path.join(out_dir, "mfccs.npy"), np.concatenate(mfccs, 0))


def main(config_path: str = "configs/config.yaml") -> None:
    config = Config.from_yaml(config_path)
    root_dir = pathlib.Path(config.data.data_location)
    for partition in ("train", "validation"):
        preprocess_folder(root_dir, partition, config)
