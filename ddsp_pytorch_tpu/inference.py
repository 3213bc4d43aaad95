"""Offline inference: timbre transfer on audio files.

The reference's headline use case (README.md:42, demo video): extract pitch
and loudness from any monophonic input and re-render it with a trained
instrument model.  The reference only offers this live through Pd; here it
is a first-class batch API (and the `transfer.py` CLI).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from ddsp_pytorch_tpu.ops import extract_loudness, extract_pitch


def extract_controls(
    audio: np.ndarray,
    sample_rate: int,
    block_size: int,
    *,
    pitch_fmin: float = 50.0,
    pitch_fmax: float = 2000.0,
    pitch_fn=None,
):
    """(T,) audio → (f0 (F,), loudness (F,)) frame-rate controls.

    pitch_fn (optional, the data/preprocess.py make_pitch_fn contract
    `(row, sample_rate, block_size) -> (F,)`) overrides the default YIN
    tracker — timbre_transfer passes the bundle's frozen tracker so
    inference-time pitch comes from the SAME estimator the model was
    trained on.
    """
    f = len(audio) // block_size
    audio = audio[: f * block_size]
    if pitch_fn is not None:
        f0 = np.asarray(pitch_fn(audio, sample_rate, block_size))
    else:
        f0 = np.asarray(
            extract_pitch(audio, sample_rate, block_size, fmin=pitch_fmin,
                          fmax=pitch_fmax)
        )
    loud = np.asarray(
        extract_loudness(jnp.asarray(audio)[None], sample_rate, block_size)
    )[0]
    return f0[:f], loud[:f]


def timbre_transfer(
    bundle_dir: str,
    audio: np.ndarray,
    sample_rate: int,
    *,
    octave_shift: float = 0.0,
    loudness_shift: float = 0.0,
    include_reverb: bool = True,
    seed: int = 0,
) -> np.ndarray:
    """Re-render `audio` through a trained instrument bundle.

    The input is resampled to the model rate by the caller (use
    utils.load_wav(path, model_sr)).  octave_shift transposes the extracted
    pitch; loudness_shift offsets the extracted loudness (in the feature's
    natural log units).
    """
    from ddsp_pytorch_tpu.export import load_bundle
    from ddsp_pytorch_tpu.models.modules import Reverb
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    model, params, config = load_bundle(bundle_dir)
    sr = config.preprocess.sample_rate
    assert sample_rate == sr, f"resample input to {sr} Hz first"
    block = config.preprocess.block_size

    # The bundle's frozen preprocess.pitch_tracker decides the estimator:
    # a model trained on hybrid pitch gets hybrid pitch at transfer time
    # (train/inference tracker mismatch degrades on noisy inputs —
    # pretrained/pitch_robustness.json, YIN vs hybrid).  make_pitch_fn
    # returns None for "yin", which is extract_controls' default path.
    from ddsp_pytorch_tpu.data.preprocess import make_pitch_fn

    f0, loud = extract_controls(
        audio, sr, block,
        pitch_fmin=config.preprocess.pitch_fmin,
        pitch_fmax=config.preprocess.pitch_fmax,
        pitch_fn=make_pitch_fn(config),
    )
    f0 = f0 * (2.0 ** octave_shift)
    loud = loud + loudness_shift

    mfcc_frames = None
    if config.model.name == "mfcc-autoencoder":
        # z comes from the input audio's MFCCs, with the bundle's frozen
        # feature geometry (and dB-floor reference) — exactly what the
        # model saw in training (data/preprocess.py)
        from ddsp_pytorch_tpu.ops.spectral import mfcc

        pc = config.preprocess
        frames = np.asarray(
            mfcc(
                jnp.asarray(audio[: len(f0) * block])[None],
                sr,
                n_mfcc=pc.n_mfcc,
                n_fft=pc.mfcc_n_fft,
                hop_length=block,
                fmin=pc.mfcc_fmin,
                fmax=pc.mfcc_fmax,
                n_mels=pc.n_mels,
                ref_db=pc.mfcc_ref_db,
            )
        )[:, : len(f0)]
        mfcc_frames = frames

    synth = StreamingSynth(
        model,
        params,
        mean_loudness=config.data.mean_loudness or 0.0,
        std_loudness=config.data.std_loudness or 1.0,
        batch=1,
        seed=seed,
    )
    out = np.asarray(
        synth.step(f0[None, :, None], loud[None, :, None], mfcc_frames)
    )[0]

    if include_reverb and "reverb" in params:
        from ddsp_pytorch_tpu.ops import fft_convolve

        reverb = Reverb(sr, sr)
        ir = reverb.apply({"params": params["reverb"]},
                          method=reverb.build_impulse)
        t = out.shape[-1]
        ir = ir[:t] if t < sr else jnp.pad(ir, (0, t - sr))
        out = np.asarray(fft_convolve(jnp.asarray(out)[None], ir[None]))[0]
    return out
