"""L5 — export: trained run → deployable streaming bundle.

Parity: reference export.py — rebuild the model from the frozen run config,
load the best checkpoint, bake the loudness stats in, and emit:

  ddsp_<name>_bundle/params.msgpack   the parameters (flax msgpack)
  ddsp_<name>_bundle/config.yaml      frozen config incl. loudness stats
  ddsp_<name>_bundle/meta.json        model name/kwargs + stats + format tag
  ddsp_<name>_impulse.wav             rendered reverb IR (README.md:99: the
                                      realtime chain applies reverb
                                      externally via this impulse)
  ddsp_<name>_config.yaml             frozen config copy next to the bundle

The TorchScript .ts of the reference is replaced by the msgpack param bundle:
the C++ runtime drives a compiled JAX step function through the bundle
(runtime/ — the libtorch-free equivalent of ddsp_model.cpp).
"""

from __future__ import annotations

import json
import os
from os import makedirs, path
from typing import Optional, Tuple

import jax
import numpy as np
from flax import serialization

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models import load_model
from ddsp_pytorch_tpu.utils.audio_io import save_wav


def _render_impulse(model, params) -> Optional[np.ndarray]:
    """Render the trained reverb impulse response, if the model has one."""
    if "reverb" not in params:
        return None
    from ddsp_pytorch_tpu.models.modules import Reverb

    reverb = Reverb(model.sample_rate, model.sample_rate)
    impulse = reverb.apply({"params": params["reverb"]}, method=reverb.build_impulse)
    return np.asarray(impulse, np.float32)


def export_run(
    run_dir: str,
    out_dir: str = "export",
    name: Optional[str] = None,
    overrides: Optional[list] = None,
) -> str:
    """Export a training run.  Returns the bundle directory path.

    `overrides`: ``key.path=value`` strings applied to the run's frozen
    config before export (Config.apply_overrides) — e.g. to relocate
    ``data.data_location`` for the --data copy.  Model/preprocess fields
    that shaped the checkpointed parameters must not be changed here.
    """
    run_dir = path.normpath(run_dir)
    name = name or path.basename(run_dir)
    makedirs(out_dir, exist_ok=True)

    config = Config.from_yaml(path.join(run_dir, "config.yaml"))
    if overrides:
        config.apply_overrides(overrides)
    if (
        config.model.name == "mfcc-autoencoder"
        and config.preprocess.mfcc_ref_db is None
    ):
        import warnings

        warnings.warn(
            "exporting an mfcc-autoencoder trained with "
            "preprocess.mfcc_ref_db=None: training MFCCs used librosa's "
            "anti-causal global-max dB floor, but the live StreamingMFCC "
            "is causal and floorless, so streamed features will diverge "
            "from training features on quiet mel bins. Retrain with a "
            "fixed mfcc_ref_db (configs/autoencoder.yaml sets 0.0) for "
            "exact train==stream agreement.",
            stacklevel=2,
        )
    model = load_model(config)

    from ddsp_pytorch_tpu.training.state import Checkpointer
    from ddsp_pytorch_tpu.training.train import make_optimizer
    from ddsp_pytorch_tpu.training.state import create_train_state

    ckptr = Checkpointer(run_dir)
    # Best-params artifact if present, else latest full checkpoint.  The
    # restore skeleton is built abstractly (jax.eval_shape): no real
    # parameter init or optimizer-state allocation just to learn the
    # pytree structure.
    sample = _dummy_batch(config)
    tx = make_optimizer(config)
    abstract = jax.eval_shape(
        lambda: create_train_state(model, sample, tx, seed=config.train.seed)
    )
    if ckptr.best_meta() is not None:
        params = ckptr.restore_best(abstract.params)
    else:
        state = ckptr.restore(abstract)
        if state is None:
            raise FileNotFoundError(f"no checkpoint found under {run_dir}")
        params = jax.device_get(state.params)

    bundle_dir = path.join(out_dir, f"ddsp_{name}_bundle")
    makedirs(bundle_dir, exist_ok=True)

    with open(path.join(bundle_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.msgpack_serialize(jax.device_get(params)))

    config.to_yaml(path.join(bundle_dir, "config.yaml"))
    config.to_yaml(path.join(out_dir, f"ddsp_{name}_config.yaml"))

    meta = {
        "format": "ddsp_pytorch_tpu.bundle.v1",
        "model": {"name": config.model.name, "kwargs": config.model.kwargs},
        "mean_loudness": config.data.mean_loudness,
        "std_loudness": config.data.std_loudness,
        "sample_rate": config.preprocess.sample_rate,
        "block_size": config.preprocess.block_size,
    }
    with open(path.join(bundle_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=2)

    impulse = _render_impulse(model, params)
    if impulse is not None:
        save_wav(
            path.join(out_dir, f"ddsp_{name}_impulse.wav"),
            impulse,
            config.preprocess.sample_rate,
        )
    return bundle_dir


def load_bundle(bundle_dir: str) -> Tuple:
    """Load an exported bundle → (model, params, config)."""
    config = Config.from_yaml(path.join(bundle_dir, "config.yaml"))
    model = load_model(config)
    with open(path.join(bundle_dir, "params.msgpack"), "rb") as f:
        raw = serialization.msgpack_restore(f.read())
    return model, raw, config


def make_streaming_synth(bundle_dir: str, batch: int = 1, **kwargs):
    """Bundle → ready StreamingSynth (what the C++ runtime instantiates)."""
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    model, params, config = load_bundle(bundle_dir)
    return StreamingSynth(
        model,
        params,
        mean_loudness=config.data.mean_loudness or 0.0,
        std_loudness=config.data.std_loudness or 1.0,
        batch=batch,
        **kwargs,
    )


def make_stream_session(bundle_dir: str, seed: int = 0, **kwargs):
    """Bundle → a sample-rate streaming session for any model family.

    Decoder bundles return the StreamingSynth itself (needs_audio=False,
    `step_samples(pitch, loudness)`); mfcc-autoencoder bundles return an
    AutoencoderStreamSession (needs_audio=True, `step_samples(pitch,
    loudness, audio)` with one block of output latency).  This is the
    single constructor the C++ host loads (runtime/ddsp_model.cpp)."""
    from ddsp_pytorch_tpu.streaming import AutoencoderStreamSession

    synth = make_streaming_synth(bundle_dir, seed=seed, **kwargs)
    if not getattr(synth, "_autoencoder", False):
        return synth
    return AutoencoderStreamSession(
        synth, make_streaming_mfcc(bundle_dir), seed=seed
    )


def make_streaming_mfcc(bundle_dir_or_config, batch: int = 1):
    """Bundle (or Config) → causal StreamingMFCC matching the bundle's
    preprocess geometry — the live feature extractor for streaming the
    mfcc-autoencoder (pair with make_streaming_synth; the reference's
    autoencoder has no realtime path at all, encoder.py:29-141).

    Exact train/stream agreement additionally requires the bundle to have
    been preprocessed with a fixed preprocess.mfcc_ref_db (see config.py);
    with the default None, training used librosa's anti-causal global-max
    dB floor and the live extractor runs floorless (differing only on mel
    bins >80 dB below each chunk's peak).
    """
    from ddsp_pytorch_tpu.streaming.mfcc import StreamingMFCC

    if isinstance(bundle_dir_or_config, Config):
        config = bundle_dir_or_config
    else:
        config = Config.from_yaml(
            path.join(bundle_dir_or_config, "config.yaml")
        )
    pc = config.preprocess
    return StreamingMFCC(
        pc.sample_rate,
        batch=batch,
        n_mfcc=pc.n_mfcc,
        n_fft=pc.mfcc_n_fft,
        hop_length=pc.block_size,
        fmin=pc.mfcc_fmin,
        fmax=pc.mfcc_fmax,
        n_mels=pc.n_mels,
        ref_db=pc.mfcc_ref_db,
    )


def _dummy_batch(config: Config):
    import jax.numpy as jnp

    f = config.n_frames
    b = 1
    batch = {
        "sig": jnp.zeros((b, config.preprocess.signal_length), jnp.float32),
        "pitch": jnp.full((b, f, 1), 200.0, jnp.float32),
        "loudness": jnp.zeros((b, f, 1), jnp.float32),
    }
    if config.model.name == "mfcc-autoencoder":
        batch["mfcc"] = jnp.zeros((b, f, config.preprocess.n_mfcc), jnp.float32)
    return batch
