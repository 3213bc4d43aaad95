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
on the 8-device virtual mesh is tests/test_time_sharded_training.py.

Arbitrary workload shapes shard via pad-and-mask (plan_time_padding): the
frame axis is padded to the smallest count whose per-shard chunk satisfies
the sharded-STFT divisibility rules, padded frames synthesize silence, the
pad region of both signals is rewritten with the reflection about the true
signal end, and frames beyond it are masked out of the loss — so the
reference's canonical 375-frame / 192 000-sample config (reference
config.yaml:5-28) shards at time ∈ {2,4,8} with ~2.5 % padded compute and
unchanged loss/gradients.  The
filtered-noise draw is bit-identical to the unsharded model's internal flax
rng stream (models/modules.py FilteredNoise.sample) and is *generated*
shard-local (threefry is partitionable), so the full-signal noise tensor
never exists on one device.

No reference analogue: the reference is single-device and chunks offline
(SURVEY.md §5 long-context).
"""

from __future__ import annotations

import dataclasses
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
    reflect_tail_into_pad,
    sharded_fft_convolve_causal,
    sharded_harmonic_synth,
    sharded_multiscale_spec_loss,
)
from ddsp_pytorch_tpu.training.state import TrainState
from ddsp_pytorch_tpu.training.train import (
    _normalize_loudness,
    apply_gradient_update,
)


@dataclasses.dataclass(frozen=True)
class TimePaddingPlan:
    """Static pad-and-mask geometry for time-sharded training.

    The workload's frame count is padded from `frames` to `frames_pad` so
    the per-shard chunk satisfies the sharded-STFT shape rules
    (parallel/ops.sharded_scale_mags): chunk % hop == 0 for every scale's
    hop, and n_fft/2 < chunk.  Padded frames carry zero synth controls (no
    audio), the target is zero-padded, both signals' pad regions are
    overwritten with the reflection about the true end
    (parallel/ops.reflect_tail_into_pad), and STFT frames centered beyond
    `t_valid` are masked out of the loss — so the sharded loss/gradients
    equal the unsharded step's on the ORIGINAL signal, for any workload
    shape.  The reference's canonical 48 kHz config (192 000 samples, 375
    frames — reference config.yaml:5-28) pads to 384 frames at time=4
    (2.4 % overhead).
    """

    n_time: int
    frames: int       # original frame count (signal_length / block_size)
    frames_pad: int   # padded frame count (== frames when nothing to pad)
    t_valid: int      # original sample count
    t_pad: int        # padded sample count

    @property
    def pad_frames(self) -> int:
        return self.frames_pad - self.frames

    @property
    def pad_samples(self) -> int:
        return self.t_pad - self.t_valid

    @property
    def chunk(self) -> int:
        return self.t_pad // max(self.n_time, 1)


def plan_time_padding(config: Config, mesh: Mesh) -> TimePaddingPlan:
    """Compute the minimal frame padding that lets this workload shard over
    the mesh's time axis; raise only when no reasonable padding exists.

    Constraints (derived in parallel/ops.py):
      * chunk = f_loc·block must be a multiple of every STFT hop
        → f_loc a multiple of lcm(hops)/gcd(lcm, block);
      * n_fft/2 < chunk for every scale (halo exchange span);
      * when padding occurs, pad_samples ≥ max n_fft/2 (valid edge frames
        must not read past T_pad) and the pad region plus its reflection
        sources must fit on the last shard (reflect_tail_into_pad).
    Padding larger than the signal itself is rejected — use fewer time
    shards or smaller scales instead.
    """
    n_time = mesh.shape["time"]
    block = config.preprocess.block_size
    t = config.preprocess.signal_length
    if t % block != 0:
        raise ValueError(
            f"time sharding: signal_length ({t}) must be a multiple of "
            f"block_size ({block})"
        )
    frames = t // block
    if n_time <= 1:
        return TimePaddingPlan(max(n_time, 1), frames, frames, t, t)

    scales = list(config.train.scales)
    hops = [int(s * (1.0 - config.train.overlap)) for s in scales]
    if any(h <= 0 for h in hops):
        raise ValueError(f"time sharding: non-positive STFT hop in {hops}")
    hop_lcm = math.lcm(*hops) if hops else 1
    f_quantum = hop_lcm // math.gcd(hop_lcm, block)
    max_half = max((s // 2 for s in scales), default=0)

    f_loc = -(-frames // n_time)               # ceil(frames / n_time)
    f_loc = -(-f_loc // f_quantum) * f_quantum  # round up to the quantum
    while True:
        chunk = f_loc * block
        frames_pad = f_loc * n_time
        t_pad = frames_pad * block
        pad_samples = t_pad - t
        ok = chunk > max_half
        if pad_samples > 0:
            # valid edge frames must not read past T_pad, and the pad
            # region + its reflection sources must live on the last shard
            ok = ok and pad_samples >= max_half
            ok = ok and 2 * t - t_pad - 1 >= (n_time - 1) * chunk
        if ok:
            return TimePaddingPlan(n_time, frames, frames_pad, t, t_pad)
        if pad_samples > t:
            raise ValueError(
                f"time sharding: cannot shard signal_length={t} "
                f"({frames} frames) over time={n_time} with scales={scales}: "
                f"satisfying chunk % lcm(hops)={hop_lcm} == 0, chunk > "
                f"n_fft/2={max_half}, and a last-shard-local reflected pad "
                f"would need more padding than the signal itself; use fewer "
                f"time shards or smaller scales"
            )
        f_loc += f_quantum


def validate_time_sharding(config: Config, mesh: Mesh) -> None:
    """Fail fast (clear message) when the workload cannot shard over the
    mesh's time axis even with pad-and-mask padding (plan_time_padding)."""
    plan_time_padding(config, mesh)


def make_time_sharded_train_step(
    model, tx, config: Config, mesh: Mesh
) -> Callable:
    """Build the pure train-step function whose loss/grads are computed with
    the DSP + loss sharded over the mesh 'time' axis (and the batch over
    'data').  Same (state, batch) -> (state, metrics) contract as
    training/train.py make_train_step; jit it with the shardings from
    parallel/sharding.py shard_time_train_step."""
    plan = plan_time_padding(config, mesh)
    scales = tuple(config.train.scales)
    overlap = config.train.overlap
    block = int(model.block_size)
    sr = int(model.sample_rate)
    has_reverb = bool(model.has_reverb)
    use_pallas = getattr(model, "use_pallas", "auto")
    needs_mfcc = isinstance(model, DDSPAutoencoder)
    noise_sharding = NamedSharding(mesh, P("data", "time", None))
    pad_f = plan.pad_frames
    t_valid = plan.t_valid

    def dsp_loss(f0, amp, mags, noise, ir, target):
        """Inside shard_map: all inputs local to this (data, time) shard
        except the replicated IR.  With pad-and-mask padding, pad-region
        synth controls are zero (no dry audio there); after the (causal)
        reverb, both signals' pad regions are rewritten with the reflection
        about the true end so the masked loss equals the unsharded one."""
        audio = sharded_harmonic_synth(
            f0, amp, block, sr, use_pallas=use_pallas
        )
        audio = audio + filtered_noise(mags, block, None, noise=noise)
        if ir is not None:
            audio = sharded_fft_convolve_causal(audio, ir)
        if pad_f:
            audio = reflect_tail_into_pad(audio, t_valid)
            target = reflect_tail_into_pad(target, t_valid)
        return sharded_multiscale_spec_loss(
            target, audio, scales, overlap, t_valid=t_valid
        )

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
        if pad_f:
            # zero-pad the target to T_pad; dsp_loss rewrites the pad
            # region with the reflection about t_valid before the loss
            sig = jnp.pad(sig, ((0, 0), (0, plan.pad_samples)))

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
            f0_2d = f0[..., 0].astype(jnp.float32)
            if pad_f:
                # pad-and-mask: padded frames synthesize silence (zero
                # harmonic amplitude, zero noise magnitudes → zero FIR);
                # f0 pads with its edge value only to keep the phase scan
                # well-defined (the resulting audio is zero either way)
                amp = jnp.pad(amp, ((0, 0), (0, pad_f), (0, 0)))
                mags = jnp.pad(mags, ((0, 0), (0, pad_f), (0, 0)))
                noise = jnp.pad(noise, ((0, 0), (0, pad_f), (0, 0)))
                f0_2d = jnp.pad(f0_2d, ((0, 0), (0, pad_f)), mode="edge")
            noise = jax.lax.with_sharding_constraint(noise, noise_sharding)
            if has_reverb:
                ir = model.apply({"params": params}, method=model.reverb_impulse)
                if t_valid < ir.shape[-1]:
                    # Reverb.__call__ truncates the IR when the signal is
                    # shorter (models/modules.py:160-169); match it at the
                    # TRUE signal length, not the padded one.
                    ir = ir[:t_valid]
                return sharded_core(f0_2d, amp, mags, noise, ir, sig)
            return sharded_core(f0_2d, amp, mags, noise, sig)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return apply_gradient_update(state, tx, loss, grads, rng)

    return train_step
