"""MFCC encoder + DDSP autoencoder model.

Parity targets: reference ddsp/models/encoder.py (MFCCEncoder: LayerNorm over
30 MFCCs → GRU → Linear to a 16-dim frame-rate latent z; DDSPAutoencoder:
DDSPDecoder with z injected into the GRU decoder).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddsp_pytorch_tpu.models.decoder import (
    GRU,
    ControlProjectionMixin,
    GRUDecoder,
)
from ddsp_pytorch_tpu.models.modules import FilteredNoise, HarmonicSynth, Reverb

N_MFCCS = 30  # reference encoder.py:41
Z_DIM = 16  # reference encoder.py:42


class MFCCEncoder(nn.Module):
    """(B, F, n_mfccs) MFCC frames → (B, F, z_dim) latent."""

    sample_rate: int
    block_size: int
    hidden_size: int
    n_mfccs: int = N_MFCCS
    z_dim: int = Z_DIM
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        mfccs: jax.Array,
        gru_state: Optional[jax.Array] = None,
        return_state: bool = False,
    ):
        """(B, F, n_mfccs) → (B, F, z_dim); optionally threads the encoder
        GRU hidden state for block streaming (the reference autoencoder has
        no realtime path at all — encoder.py:29-141)."""
        x = nn.LayerNorm(dtype=self.dtype)(mfccs)
        x, state = GRU(self.hidden_size, dtype=self.dtype)(x, gru_state)
        z = nn.Dense(self.z_dim, dtype=self.dtype)(x)
        if return_state:
            return z, state
        return z


class DDSPAutoencoder(ControlProjectionMixin, nn.Module):
    """The "mfcc-autoencoder" model (reference encoder.py:29-141)."""

    hidden_size: int
    n_harmonic: int
    n_bands: int
    sample_rate: int
    block_size: int
    has_reverb: bool
    dtype: Any = jnp.float32
    use_pallas: str = "auto"

    def setup(self):
        self.encoder = MFCCEncoder(
            self.sample_rate,
            self.block_size,
            self.hidden_size,
            n_mfccs=N_MFCCS,
            z_dim=Z_DIM,
            dtype=self.dtype,
        )
        self.decoder = GRUDecoder(self.hidden_size, z_dim=Z_DIM, dtype=self.dtype)
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

    def frame_controls(self, f0: jax.Array, loudness: jax.Array,
                       mfcc: jax.Array):
        """Frame-rate controls only (no synthesis): encoder + decoder +
        projections — the NN stage of the long-form time-sharded path
        (parallel/longform.py), mirroring DDSPDecoder.frame_controls.
        Returns (harmonic_ctrls, noise_ctrls)."""
        f0 = f0.astype(jnp.float32)
        z = self.encoder(mfcc)
        hidden = self.decoder(f0, loudness, z=z)
        return self._controls(hidden, f0)

    def __call__(self, batch: Dict[str, jax.Array]) -> Dict[str, Any]:
        """batch: {'pitch', 'loudness', 'mfcc'} → output dict (adds 'z')."""
        f0 = batch["pitch"].astype(jnp.float32)
        loudness, mfcc = batch["loudness"], batch["mfcc"]

        z = self.encoder(mfcc)
        hidden = self.decoder(f0, loudness, z=z)

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
            "z": z,
        }

    def streaming_step(
        self,
        f0: jax.Array,
        loudness: jax.Array,
        mfcc: jax.Array,
        enc_gru_state: jax.Array,
        gru_state: jax.Array,
        phase: jax.Array,
        noise: Optional[jax.Array] = None,
    ):
        """One streaming block: frame-rate controls + MFCC frames in, audio
        plus carries (encoder GRU, decoder GRU, oscillator phase) out.

        The reference's autoencoder has NO realtime path (encoder.py:29-141
        defines no realtime_forward); this one is exact — block-streamed
        output equals the offline forward given the same noise draw
        (tests/test_streaming.py).  MFCC frames come from a causal extractor
        (streaming/mfcc.py StreamingMFCC).  No reverb, matching the realtime
        contract (the exported IR is applied externally or via the in-stream
        partitioned convolution in streaming/StreamingSynth).
        """
        f0 = f0.astype(jnp.float32)
        z, new_enc_state = self.encoder(
            mfcc, gru_state=enc_gru_state, return_state=True
        )
        hidden, new_gru_state = self.decoder(
            f0, loudness, z=z, gru_state=gru_state, return_state=True
        )
        harmonic_ctrls, noise_ctrls = self._controls(hidden, f0)
        harmonic, new_phase = self.harmonic_synth(
            **harmonic_ctrls, phase0=phase, return_phase=True
        )
        noise_audio = self.noise_synth(**noise_ctrls, noise=noise)
        return harmonic + noise_audio, new_enc_state, new_gru_state, new_phase

    @staticmethod
    def reconstruction_report(output: dict, config, index: int = 0):
        """2×3 diagnostic figure (reference encoder.py:105-141)."""
        from ddsp_pytorch_tpu.training.reports import reconstruction_report

        return reconstruction_report(output, config, index=index)
