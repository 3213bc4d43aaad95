"""GRU control decoder + the single-instrument DDSP decoder model.

Parity targets: reference ddsp/models/decoder.py.

TPU-native design notes:
  * The GRU is written directly (not nn.GRUCell-in-nn.RNN) so the input
    projection of *all* frames runs as one big MXU matmul outside the scan;
    the lax.scan carries only the O(H²) recurrent half.  This is the standard
    trick for making small RNNs TPU-efficient (the scan is latency-bound;
    batch must fill the chip while it runs — SURVEY.md §7 hard part #5).
  * The streaming path is explicit-state: `streaming_step` threads a
    StreamState pytree (GRU carry + oscillator phase + noise-tail carry held
    by streaming/), fixing the reference's broken `realtime_forward`
    (decoder.py:143,152 references renamed attributes — SURVEY.md §2.8.2).
  * NN compute can run bf16 (`dtype`); controls are cast back to f32 before
    the DSP synths (phase accumulation must be f32).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_pytorch_tpu.models.modules import FilteredNoise, HarmonicSynth, Reverb

N_LAYERS = 3  # MLP depth used throughout (reference decoder.py:22)


class MLP(nn.Module):
    """n_layers × [Dense → LayerNorm → LeakyReLU] (reference core.py:122-129)."""

    hidden_size: int
    n_layers: int = N_LAYERS
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        for _ in range(self.n_layers):
            x = nn.Dense(self.hidden_size, dtype=self.dtype)(x)
            x = nn.LayerNorm(dtype=self.dtype)(x)
            x = nn.leaky_relu(x)
        return x


class GRU(nn.Module):
    """Single-layer GRU over (B, F, in) sequences, torch gate semantics.

    Gate order [r, z, n] with separate input/hidden biases:
      r = σ(x·W_r + b_ir + h·U_r + b_hr)
      z = σ(x·W_z + b_iz + h·U_z + b_hz)
      n = tanh(x·W_n + b_in + r ⊙ (h·U_n + b_hn))
      h' = (1 − z) ⊙ n + z ⊙ h
    The x-projections of all frames are computed before the scan (one MXU
    matmul); the scan body is two (B,H)×(H,3H)-free ops + elementwise gates.
    """

    hidden_size: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, initial_state: Optional[jax.Array] = None):
        """x (B, F, in) → (outputs (B, F, H), final_state (B, H))."""
        b = x.shape[0]
        h_dim = self.hidden_size
        glorot = nn.initializers.glorot_uniform()
        w_ih = self.param("w_ih", glorot, (x.shape[-1], 3 * h_dim))
        w_hh = self.param("w_hh", nn.initializers.orthogonal(), (h_dim, 3 * h_dim))
        b_ih = self.param("b_ih", nn.initializers.zeros, (3 * h_dim,))
        b_hh = self.param("b_hh", nn.initializers.zeros, (3 * h_dim,))

        dt = self.dtype
        # Input half for every frame at once: (B, F, 3H) on the MXU.
        x_proj = x.astype(dt) @ w_ih.astype(dt) + b_ih.astype(dt)

        if initial_state is None:
            h0 = jnp.zeros((b, h_dim), dt)
        else:
            h0 = initial_state.astype(dt)

        w_hh_t = w_hh.astype(dt)
        b_hh_t = b_hh.astype(dt)

        def step(h, xp):
            h_proj = h @ w_hh_t + b_hh_t
            xr, xz, xn = jnp.split(xp, 3, axis=-1)
            hr, hz, hn = jnp.split(h_proj, 3, axis=-1)
            r = jax.nn.sigmoid(xr + hr)
            z = jax.nn.sigmoid(xz + hz)
            n = jnp.tanh(xn + r * hn)
            h_new = (1.0 - z) * n + z * h
            return h_new, h_new

        # scan over frames: move F to the leading axis
        final, outputs = jax.lax.scan(step, h0, jnp.swapaxes(x_proj, 0, 1))
        return jnp.swapaxes(outputs, 0, 1), final


class GRUDecoder(nn.Module):
    """Control network: per-input MLPs → GRU → skip-concat → output MLP.

    Parity: reference decoder.py:9-68.  GRU input is the concat of the f0 and
    loudness MLP stacks (and the z MLP when z_dim is set); the GRU output is
    skip-concatenated with *raw* f0 and loudness before the output MLP.
    """

    hidden_size: int
    z_dim: Optional[int] = None
    dtype: Any = jnp.float32

    def setup(self):
        self.f0_mlp = MLP(self.hidden_size, dtype=self.dtype)
        self.loudness_mlp = MLP(self.hidden_size, dtype=self.dtype)
        if self.z_dim is not None:
            self.z_mlp = MLP(self.hidden_size, dtype=self.dtype)
        self.gru = GRU(self.hidden_size, dtype=self.dtype)
        self.out_mlp = MLP(self.hidden_size, dtype=self.dtype)

    def __call__(
        self,
        f0: jax.Array,
        loudness: jax.Array,
        z: Optional[jax.Array] = None,
        gru_state: Optional[jax.Array] = None,
        return_state: bool = False,
    ):
        """f0, loudness (B, F, 1) → hidden (B, F, hidden_size)."""
        parts = [self.f0_mlp(f0), self.loudness_mlp(loudness)]
        if self.z_dim is not None:
            assert z is not None, "z_dim set but no z given"
            parts.append(self.z_mlp(z))
        hidden = jnp.concatenate(parts, axis=-1)
        gru_out, state = self.gru(hidden, gru_state)
        hidden = jnp.concatenate(
            [gru_out, f0.astype(gru_out.dtype), loudness.astype(gru_out.dtype)],
            axis=-1,
        )
        hidden = self.out_mlp(hidden)
        if return_state:
            return hidden, state
        return hidden


class ControlProjectionMixin:
    """Shared hidden-state -> synth-controls projection.

    The contract (reference decoder.py:86-87, 106-117: harmonic_proj column
    0 = global amplitude, rest = distribution; noise_proj -> band
    magnitudes; controls computed in f32) is identical for both model
    families; this mixin is its single home (DDSPDecoder and
    DDSPAutoencoder both provide harmonic_proj/noise_proj/harmonic_synth/
    noise_synth in setup)."""

    def _controls(self, hidden, f0):
        """Project decoder hidden state to synth controls (f32)."""
        param = self.harmonic_proj(hidden).astype(jnp.float32)
        amplitudes = param[..., :1]
        harmonic_distribution = param[..., 1:]
        harmonic_ctrls = self.harmonic_synth.get_controls(
            amplitudes, harmonic_distribution, f0
        )
        magnitudes = self.noise_proj(hidden).astype(jnp.float32)
        noise_ctrls = self.noise_synth.get_controls(magnitudes)
        return harmonic_ctrls, noise_ctrls

    def sample_noise(self, f0: jax.Array) -> jax.Array:
        """(B, F, block_size) noise, bit-identical to the internal draw of
        __call__ (FilteredNoise.sample) — apply with the same
        rngs={'noise': key}.  Used by the time-sharded train step."""
        return self.noise_synth.sample(f0.shape[0], f0.shape[1])

    def reverb_impulse(self) -> jax.Array:
        """(sample_rate,) trained reverb IR (requires has_reverb).  The
        time-sharded train step applies it via the halo'd causal convolution
        (parallel/ops.py sharded_fft_convolve_causal) instead of the in-model
        full-signal fft_convolve."""
        return self.reverb.build_impulse()


class DDSPDecoder(ControlProjectionMixin, nn.Module):
    """The "single-inst-decoder" model (reference decoder.py:70-191).

    forward(batch) consumes frame-rate pitch + (normalized) loudness and
    returns the rendered signal plus all intermediate controls.
    """

    hidden_size: int
    n_harmonic: int
    n_bands: int
    sample_rate: int
    block_size: int
    has_reverb: bool
    dtype: Any = jnp.float32
    use_pallas: str = "auto"

    def setup(self):
        self.decoder = GRUDecoder(self.hidden_size, z_dim=None, dtype=self.dtype)
        # column 0 of harmonic_proj = global amplitude, rest = distribution
        self.harmonic_proj = nn.Dense(self.n_harmonic + 1, dtype=self.dtype)
        self.noise_proj = nn.Dense(self.n_bands, dtype=self.dtype)
        self.harmonic_synth = HarmonicSynth(
            block_size=self.block_size,
            sample_rate=self.sample_rate,
            use_pallas=self.use_pallas,
        )
        self.noise_synth = FilteredNoise(
            block_size=self.block_size, window_size=self.n_bands
        )
        if self.has_reverb:
            self.reverb = Reverb(self.sample_rate, self.sample_rate)

    def frame_controls(self, f0: jax.Array, loudness: jax.Array):
        """Frame-rate controls only (no synthesis): decoder + projections.

        Used by the long-form path (parallel/longform.py): the tiny NN runs
        data-parallel while the sample-rate DSP shards the time axis.
        Returns (harmonic_ctrls, noise_ctrls).
        """
        f0 = f0.astype(jnp.float32)
        hidden = self.decoder(f0, loudness)
        return self._controls(hidden, f0)

    def __call__(self, batch: Dict[str, jax.Array]) -> Dict[str, Any]:
        """batch: {'pitch': (B,F,1), 'loudness': (B,F,1)} → output dict with
        f0/loudness/signal/noise/harmonic_audio/noise_ctrls/harmonic_ctrls
        (keys mirror reference decoder.py:127-135)."""
        f0, loudness = batch["pitch"], batch["loudness"]
        f0 = f0.astype(jnp.float32)
        hidden = self.decoder(f0, loudness)

        harmonic_ctrls, noise_ctrls = self._controls(hidden, f0)
        harmonic = self.harmonic_synth(**harmonic_ctrls)
        noise = self.noise_synth(**noise_ctrls)

        signal = harmonic + noise
        if self.has_reverb:
            signal = self.reverb(signal)

        return {
            "f0": f0,
            "loudness": loudness,
            "signal": signal,
            "noise": noise,
            "harmonic_audio": harmonic,
            "noise_ctrls": noise_ctrls,
            "harmonic_ctrls": harmonic_ctrls,
        }

    def streaming_step(
        self,
        f0: jax.Array,
        loudness: jax.Array,
        gru_state: jax.Array,
        phase: jax.Array,
        noise: Optional[jax.Array] = None,
    ):
        """One streaming block: frame-rate controls in, audio + carries out.

        The working realtime path (the reference's `realtime_forward`,
        decoder.py:138-158, is broken — SURVEY.md §2.8.2 — and carries no
        oscillator phase at all; this one is exact: streaming output equals
        offline output, see tests/test_streaming.py).  No reverb, matching
        the reference's realtime contract (applied externally via the
        exported IR).
        """
        f0 = f0.astype(jnp.float32)
        hidden, new_gru_state = self.decoder(
            f0, loudness, gru_state=gru_state, return_state=True
        )
        harmonic_ctrls, noise_ctrls = self._controls(hidden, f0)
        harmonic, new_phase = self.harmonic_synth(
            **harmonic_ctrls, phase0=phase, return_phase=True
        )
        noise_audio = self.noise_synth(**noise_ctrls, noise=noise)
        return harmonic + noise_audio, new_gru_state, new_phase

    @staticmethod
    def reconstruction_report(output: dict, config, index: int = 0):
        """2×3 diagnostic figure (reference decoder.py:160-191); delegates to
        training/reports.py which builds it from an eval-step output dict."""
        from ddsp_pytorch_tpu.training.reports import reconstruction_report

        return reconstruction_report(output, config, index=index)
