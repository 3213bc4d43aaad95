"""Time-sharded training step: gradients through the distributed DSP.

Distributes the reference's training computation (reference train.py:84-112)
over a ('data', 'time') mesh: the frame-rate control network (GRU decoder,
~6 M params) runs data-parallel with frames whole (a GRU scan is sequential
in time — SURVEY.md §2.7 ring-attention row), while the sample-rate DSP and
the multi-scale STFT loss shard the *time* axis via parallel/ops.py:

  * oscillator phase cumsum  → distributed exclusive scan (all_gather of
    per-shard phase totals over ICI), sharded_phase_offsets;
  * reverb convolution       → overlap-scatter block convolution with
    ppermute tail hand-off, sharded_fft_convolve_causal;
  * multi-scale STFT loss    → halo'd frames + psum'd per-scale sums,
    sharded_multiscale_spec_loss.

Gradients flow through all three collectives (all_gather / ppermute / psum
each have exact transposes), and the resulting step matches the unsharded
training/train.py make_train_step to tight tolerance — the equivalence test
on the 8-device virtual mesh is tests/test_time_sharded_training.py.  The
filtered-noise draw is bit-identical to the unsharded model's internal flax
rng stream (models/modules.py FilteredNoise.sample) and is *generated*
shard-local (threefry is partitionable), so the full-signal noise tensor
never exists on one device.

No reference analogue: the reference is single-device and chunks offline
(SURVEY.md §5 long-context).
"""

from __future__ import annotations

import math
from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.models.encoder import DDSPAutoencoder
from ddsp_pytorch_tpu.ops.filters import filtered_noise
from ddsp_pytorch_tpu.parallel.ops import (
    checked_shard_map,
    sharded_fft_convolve_causal,
    sharded_harmonic_synth,
    sharded_multiscale_spec_loss,
)
from ddsp_pytorch_tpu.training.state import TrainState
from ddsp_pytorch_tpu.training.train import (
    _normalize_loudness,
    apply_gradient_update,
)


def validate_time_sharding(config: Config, mesh: Mesh) -> None:
    """Fail fast (clear message) when the workload's shapes cannot shard
    over the mesh's time axis.  Constraints come from parallel/ops.py:
    every STFT scale needs chunk % hop == 0 and n_fft/2 < chunk, and the
    frame axis must divide evenly."""
    n_time = mesh.shape["time"]
    if n_time <= 1:
        return
    t = config.preprocess.signal_length
    block = config.preprocess.block_size
    frames = t // block
    if frames % n_time != 0:
        raise ValueError(
            f"time sharding: frame count {frames} (signal_length/block_size) "
            f"must be divisible by the mesh time axis ({n_time})"
        )
    chunk = t // n_time
    hops = [int(s * (1.0 - config.train.overlap)) for s in config.train.scales]
    hop_lcm = math.lcm(*hops) if hops else 1
    for s, hop in zip(config.train.scales, hops):
        if chunk % hop != 0:
            raise ValueError(
                f"time sharding: per-shard chunk {chunk} must be a multiple "
                f"of every STFT hop; scale {s} has hop {hop} "
                f"(pick signal_length/time divisible by {hop_lcm}, the LCM "
                f"of all hops)"
            )
        if s // 2 >= chunk:
            raise ValueError(
                f"time sharding: n_fft/2 ({s // 2}) must be < per-shard "
                f"chunk ({chunk}); use fewer time shards or smaller scales"
            )


def make_time_sharded_train_step(
    model, tx, config: Config, mesh: Mesh
) -> Callable:
    """Build the pure train-step function whose loss/grads are computed with
    the DSP + loss sharded over the mesh 'time' axis (and the batch over
    'data').  Same (state, batch) -> (state, metrics) contract as
    training/train.py make_train_step; jit it with the shardings from
    parallel/sharding.py shard_time_train_step."""
    validate_time_sharding(config, mesh)
    scales = tuple(config.train.scales)
    overlap = config.train.overlap
    block = int(model.block_size)
    sr = int(model.sample_rate)
    has_reverb = bool(model.has_reverb)
    use_pallas = getattr(model, "use_pallas", "auto")
    needs_mfcc = isinstance(model, DDSPAutoencoder)
    noise_sharding = NamedSharding(mesh, P("data", "time", None))

    def dsp_loss(f0, amp, mags, noise, ir, target):
        """Inside shard_map: all inputs local to this (data, time) shard
        except the replicated IR."""
        audio = sharded_harmonic_synth(
            f0, amp, block, sr, use_pallas=use_pallas
        )
        audio = audio + filtered_noise(mags, block, None, noise=noise)
        if ir is not None:
            audio = sharded_fft_convolve_causal(audio, ir)
        return sharded_multiscale_spec_loss(target, audio, scales, overlap)

    local = P("data", "time")
    local3 = P("data", "time", None)
    check = use_pallas != "interpret"  # see parallel/ops.checked_shard_map
    if has_reverb:
        sharded_core = checked_shard_map(
            dsp_loss,
            mesh=mesh,
            in_specs=(local, local3, local3, local3, P(), local),
            out_specs=P(),
            check=check,
        )
    else:
        def dsp_loss_no_reverb(f0, amp, mags, noise, target):
            return dsp_loss(f0, amp, mags, noise, None, target)

        sharded_core = checked_shard_map(
            dsp_loss_no_reverb,
            mesh=mesh,
            in_specs=(local, local3, local3, local3, local),
            out_specs=P(),
            check=check,
        )

    def train_step(state: TrainState, batch: Dict[str, jax.Array]):
        rng, noise_rng = jax.random.split(state.rng)
        sig = batch["sig"]

        def loss_fn(params):
            model_batch = _normalize_loudness(
                batch, state.mean_loudness, state.std_loudness
            )
            f0 = model_batch["pitch"]
            # NN stage (frame-rate, data-parallel, frames whole): decoder
            # (+ encoder for the autoencoder) -> synth controls.
            if needs_mfcc:
                harmonic_ctrls, noise_ctrls = model.apply(
                    {"params": params},
                    f0,
                    model_batch["loudness"],
                    model_batch["mfcc"],
                    method=model.frame_controls,
                )
            else:
                harmonic_ctrls, noise_ctrls = model.apply(
                    {"params": params},
                    f0,
                    model_batch["loudness"],
                    method=model.frame_controls,
                )
            amp = (
                harmonic_ctrls["harmonic_distribution"]
                * harmonic_ctrls["amplitudes"]
            )
            mags = noise_ctrls["magnitudes"]
            # Noise: the SAME flax rng stream as the unsharded forward
            # (FilteredNoise.sample), generated shard-local under the
            # sharding constraint (partitionable threefry).
            noise = model.apply(
                {"params": params},
                f0,
                rngs={"noise": noise_rng},
                method=model.sample_noise,
            )
            noise = jax.lax.with_sharding_constraint(noise, noise_sharding)
            f0_2d = f0[..., 0].astype(jnp.float32)
            if has_reverb:
                ir = model.apply({"params": params}, method=model.reverb_impulse)
                t = sig.shape[-1]
                if t < ir.shape[-1]:
                    # Reverb.__call__ truncates the IR when the signal is
                    # shorter (models/modules.py:160-169); match it.
                    ir = ir[:t]
                return sharded_core(f0_2d, amp, mags, noise, ir, sig)
            return sharded_core(f0_2d, amp, mags, noise, sig)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_gradient_update(state, tx, loss, grads, rng)

    return train_step
