"""Synthesizer modules (L1): HarmonicSynth, FilteredNoise, Reverb.

Each keeps the reference's ``get_controls() → forward()`` split (reference
ddsp/models/modules.py — it is a good API: controls are the interpretable
frame-rate synth parameters, logged and plotted by the diagnostics).

Audio is (B, T) float32 throughout this framework (the reference carries a
trailing singleton channel axis; it is squeezed at the loss anyway).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_pytorch_tpu import ops


class HarmonicSynth(nn.Module):
    """Harmonic (sinusoidal) oscillator bank.

    Parity: reference modules.py:38-98.  `get_controls` applies the
    exponentiated-sigmoid nonlinearity to amplitude and distribution, the
    Nyquist anti-alias mask, and normalizes the distribution to sum 1;
    `__call__` renders via the fused frame-factored oscillator
    (ops/oscillator.py) — no (B, T, K) materialization, unlike the reference.
    """

    block_size: int
    sample_rate: int
    use_pallas: str = "auto"

    def get_controls(
        self, amplitudes: jax.Array, harmonic_distribution: jax.Array, f0: jax.Array
    ) -> Dict[str, jax.Array]:
        """amplitudes (B,F,1), harmonic_distribution (B,F,K), f0 (B,F,1)."""
        amplitudes = ops.scale_function(amplitudes)
        harmonic_distribution = ops.scale_function(harmonic_distribution)
        harmonic_distribution = ops.remove_above_nyquist(
            harmonic_distribution, f0, self.sample_rate
        )
        harmonic_distribution = harmonic_distribution / jnp.sum(
            harmonic_distribution, axis=-1, keepdims=True
        )
        return {
            "f0": f0,
            "harmonic_distribution": harmonic_distribution,
            "amplitudes": amplitudes,
        }

    def __call__(
        self,
        amplitudes: jax.Array,
        harmonic_distribution: jax.Array,
        f0: jax.Array,
        phase0: Optional[jax.Array] = None,
        return_phase: bool = False,
    ):
        """Render audio from controls (run get_controls first).  (B, F*S)."""
        harmonic_amps = harmonic_distribution * amplitudes
        return ops.harmonic_synth_frames(
            f0[..., 0],
            harmonic_amps,
            self.block_size,
            self.sample_rate,
            phase0=phase0,
            return_phase=return_phase,
            use_pallas=self.use_pallas,
        )

    @staticmethod
    def plot(ax, ctrls: dict, index: int = 0):
        """Harmonic-distribution heatmap (reference modules.py:82-98)."""
        import numpy as np

        from ddsp_pytorch_tpu.utils.plots import plot_spec

        dist = np.asarray(ctrls["harmonic_distribution"])[index].T
        ax.set_title("harmonic distribution")
        ax.set_xlabel("frames")
        ax.set_ylabel("harmonic number")
        return plot_spec(dist, ax, amp_to_db=True)


class FilteredNoise(nn.Module):
    """Subtractive synthesizer: frame-wise FIR-filtered uniform noise.

    Parity: reference modules.py:101-146 (initial_bias=-5.0 so noise starts
    quiet; uniform noise in [-1, 1) — the reference's comment says N(0,1) but
    its code draws uniform, and uniform is the implemented intent here).
    """

    block_size: int
    window_size: int
    initial_bias: float = -5.0

    def get_controls(self, magnitudes: jax.Array) -> Dict[str, jax.Array]:
        return {"magnitudes": ops.scale_function(magnitudes + self.initial_bias)}

    def __call__(
        self, magnitudes: jax.Array, noise: Optional[jax.Array] = None
    ) -> jax.Array:
        """magnitudes (B, F, n_bands) → audio (B, F*block_size)."""
        if noise is None:
            rng = self.make_rng("noise")
        else:
            rng = None
        return ops.filtered_noise(magnitudes, self.block_size, rng, noise=noise)

    def sample(self, b: int, f: int) -> jax.Array:
        """Draw the (b, f, block_size) uniform noise __call__ would draw.

        Same module scope, same rng collection, first make_rng of the apply
        → the SAME key flax hands ops.filtered_noise inside the full forward
        (ops/filters.py:91-94 draws with this shape/dtype).  The time-sharded
        train step (training/time_sharded.py) uses this so its externally
        injected noise is bit-identical to the unsharded model.apply's
        internal draw — the equivalence tests rely on it.
        """
        rng = self.make_rng("noise")
        return (
            jax.random.uniform(rng, (b, f, self.block_size), jnp.float32) * 2.0
            - 1.0
        )

    @staticmethod
    def plot(ax, ctrls: dict, index: int = 0):
        """Noise-magnitude heatmap (reference modules.py:130-146)."""
        import numpy as np

        from ddsp_pytorch_tpu.utils.plots import plot_spec

        mags = np.asarray(ctrls["magnitudes"])[index].T
        ax.set_title("noise magnitude")
        ax.set_xlabel("frames")
        ax.set_ylabel("frequency bin")
        return plot_spec(mags, ax, amp_to_db=True)


class Reverb(nn.Module):
    """Trainable convolution reverb.

    Parity: reference modules.py:7-35 — a learned 1 s noise IR shaped by a
    trainable exponential decay and wet gain, with the dry path hard-wired as
    impulse[0] = 1; applied by FFT convolution over the full signal.
    """

    length: int
    sample_rate: int
    initial_wet: float = 0.0
    initial_decay: float = 5.0

    def setup(self):
        self.noise = self.param(
            "noise",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -1.0, 1.0),
            (self.length,),
        )
        self.decay = self.param(
            "decay", lambda key: jnp.asarray(float(self.initial_decay), jnp.float32)
        )
        self.wet = self.param(
            "wet", lambda key: jnp.asarray(float(self.initial_wet), jnp.float32)
        )

    def build_impulse(self) -> jax.Array:
        """(length,) impulse response: noise · exp-decay · wet, dry tap = 1."""
        t = jnp.arange(self.length, dtype=jnp.float32) / self.sample_rate
        envelope = jnp.exp(-jax.nn.softplus(-self.decay) * t * 500.0)
        impulse = self.noise * envelope * jax.nn.sigmoid(self.wet)
        return impulse.at[0].set(1.0)

    def __call__(self, x: jax.Array) -> jax.Array:
        """x (B, T) → (B, T).  IR is padded to T (or truncated when the
        signal is shorter than the IR — T < length crashes the reference)."""
        impulse = self.build_impulse()
        t = x.shape[-1]
        if t >= self.length:
            impulse = jnp.pad(impulse, (0, t - self.length))
        else:
            impulse = impulse[:t]
        return ops.fft_convolve(x, impulse[None, :])
