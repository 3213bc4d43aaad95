"""Long-form synthesis over a (data, time) mesh.

North-star workload (BASELINE.json config #5): many concurrent voices ×
minutes of audio, too large for one chip's HBM.  No reference analogue (it
chunks offline, SURVEY.md §5).

Split of labor:
  * The control network (GRU decoder — ~6 M params, frame-rate) runs
    data-parallel: voices shard over 'data', frames stay whole (a GRU is
    sequential in time; sharding its scan would serialize across chips).
  * The sample-rate DSP — oscillator bank, filtered noise, reverb — shards
    the *time* axis too, via the halo collectives in parallel/ops.py.  Audio
    lives only as a ('data','time')-sharded jax.Array; a (256 voices ×
    10 min × 48 kHz) f32 signal is ~29 GB and never exists on one device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ddsp_pytorch_tpu.parallel.ops import (
    checked_shard_map,
    sharded_fft_convolve_causal,
    sharded_harmonic_synth,
)


class LongFormSynthesizer:
    """Render (B, F, 1) frame-rate controls into ('data','time')-sharded
    audio through a trained DDSPDecoder."""

    def __init__(
        self,
        model,
        params,
        mesh: Mesh,
        *,
        use_pallas: str = "auto",
        include_reverb: bool = True,
        mean_loudness: float = 0.0,
        std_loudness: float = 1.0,
    ):
        self.model = model
        self.params = params
        self.mesh = mesh
        self.block_size = int(model.block_size)
        self.sample_rate = int(model.sample_rate)
        self.include_reverb = include_reverb and model.has_reverb
        self.mean_loudness = mean_loudness
        self.std_loudness = std_loudness
        self._noise_jits = {}  # (B, F) -> sharded-output noise draw

        rep = NamedSharding(mesh, P())
        voices = NamedSharding(mesh, P("data"))

        from ddsp_pytorch_tpu.models.encoder import DDSPAutoencoder

        # mfcc-autoencoder long-form: the encoder is frame-rate NN like the
        # decoder, so it joins the data-parallel controls stage (z never
        # needs the time axis sharded)
        self._autoencoder = isinstance(model, DDSPAutoencoder)

        def controls_fn(params, f0, loudness, mfcc=None):
            loudness = (loudness - self.mean_loudness) / self.std_loudness
            if self._autoencoder:
                return model.apply(
                    {"params": params}, f0, loudness, mfcc,
                    method=model.frame_controls,
                )
            return model.apply(
                {"params": params}, f0, loudness, method=model.frame_controls
            )

        # NN stage: voices data-parallel, frames replicated along 'time'.
        self._controls = jax.jit(
            controls_fn,
            in_shardings=(
                (rep, voices, voices, voices)
                if self._autoencoder
                else (rep, voices, voices)
            ),
        )

        block, sr = self.block_size, self.sample_rate

        def dsp_fn(f0, amp, mags, noise, ir):
            # all inputs already local to this (data, time) shard
            audio = sharded_harmonic_synth(
                f0, amp, block, sr, use_pallas=use_pallas
            )
            from ddsp_pytorch_tpu.ops.filters import filtered_noise

            # the exact synth used in training/streaming, injected noise
            audio = audio + filtered_noise(mags, block, None, noise=noise)
            if ir is not None:
                audio = sharded_fft_convolve_causal(audio, ir)
            return audio

        in_specs = (
            P("data", "time"),  # f0 frames
            P("data", "time", None),  # harmonic amps
            P("data", "time", None),  # noise magnitudes
            P("data", "time", None),  # noise draw (B, F, S)
            P() if self.include_reverb else None,  # reverb IR (replicated)
        )
        check = use_pallas != "interpret"  # see checked_shard_map
        if not self.include_reverb:
            def dsp_no_reverb(f0, amp, mags, noise):
                return dsp_fn(f0, amp, mags, noise, None)

            self._dsp = jax.jit(
                checked_shard_map(
                    dsp_no_reverb,
                    mesh=mesh,
                    in_specs=in_specs[:4],
                    out_specs=P("data", "time"),
                    check=check,
                )
            )
        else:
            self._dsp = jax.jit(
                checked_shard_map(
                    dsp_fn,
                    mesh=mesh,
                    in_specs=in_specs,
                    out_specs=P("data", "time"),
                    check=check,
                )
            )

    def _draw_noise(self, b: int, f: int):
        """Sharding-aware noise draw: jit with a ('data','time')-sharded
        output so each device generates only its (B, F, S) slice — the
        full-signal-sized noise tensor must never exist on one device (a
        256-voice x 10-min draw is ~29 GB, the module docstring's point).
        Threefry is partitionable, so the values equal an unsharded draw."""
        key = (b, f)
        fn = self._noise_jits.get(key)
        if fn is None:
            shape = (b, f, self.block_size)
            fn = jax.jit(
                lambda rng: jax.random.uniform(rng, shape, jnp.float32) * 2.0
                - 1.0,
                out_shardings=NamedSharding(
                    self.mesh, P("data", "time", None)
                ),
            )
            self._noise_jits[key] = fn
        return lambda rng: fn(rng)

    def _reverb_ir(self):
        from ddsp_pytorch_tpu.models.modules import Reverb

        reverb = Reverb(self.sample_rate, self.sample_rate)
        return reverb.apply(
            {"params": self.params["reverb"]}, method=reverb.build_impulse
        )

    def synthesize(
        self, f0, loudness, mfcc=None, rng: Optional[jax.Array] = None
    ) -> jax.Array:
        """f0, loudness (B, F, 1) → (B, F*block_size) sharded audio.
        mfcc (B, F, n_mfccs): required for mfcc-autoencoder models."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        if self._autoencoder:
            if mfcc is None:
                raise ValueError("mfcc-autoencoder long-form: pass mfcc")
            harmonic_ctrls, noise_ctrls = self._controls(
                self.params, f0, loudness, mfcc
            )
        else:
            harmonic_ctrls, noise_ctrls = self._controls(
                self.params, f0, loudness
            )
        amp = (
            harmonic_ctrls["harmonic_distribution"] * harmonic_ctrls["amplitudes"]
        )
        mags = noise_ctrls["magnitudes"]
        b, f = f0.shape[0], f0.shape[1]
        noise = self._draw_noise(b, f)(rng)
        f0_2d = f0[..., 0]
        if self.include_reverb:
            return self._dsp(f0_2d, amp, mags, noise, self._reverb_ir())
        return self._dsp(f0_2d, amp, mags, noise)
