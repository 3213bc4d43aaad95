"""Multi-scale STFT spectral loss.

Parity: reference train.py:70-76 (`multiscale_spec_loss`): for each FFT
scale, L1 between linear magnitudes plus L1 between safe-log magnitudes,
summed over scales.  Scales/overlap default to the reference workload
(config.yaml:24-25: [4096, 2048, 1024, 512, 256, 128] at 0.75 overlap).

Loss math runs in f32 regardless of model compute dtype.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ddsp_pytorch_tpu.ops import multiscale_fft, safe_log


def multiscale_spec_loss(
    ori_stft: List[jax.Array], rec_stft: List[jax.Array]
) -> jax.Array:
    """Σ_scales [ mean|S_x − S_y| + mean|log S_x − log S_y| ]."""
    loss = jnp.asarray(0.0, jnp.float32)
    for s_x, s_y in zip(ori_stft, rec_stft):
        lin = jnp.mean(jnp.abs(s_x - s_y))
        log = jnp.mean(jnp.abs(safe_log(s_x) - safe_log(s_y)))
        loss = loss + lin + log
    return loss


def spectral_loss_from_signals(
    target: jax.Array,
    reconstruction: jax.Array,
    scales: Sequence[int],
    overlap: float,
):
    """Compute both multiscale STFTs and the loss; returns
    (loss, ori_stft, rec_stft) so drivers can log the spectrograms
    (reference train.py:92-103 keeps both for the reconstruction report)."""
    if target.shape[-1] != reconstruction.shape[-1]:
        # e.g. a batch whose sig length is not frames*block_size: the
        # model renders frames*block_size samples, so the two STFTs would
        # fail deep inside XLA with an opaque broadcast error
        raise ValueError(
            f"target length {target.shape[-1]} != reconstruction length "
            f"{reconstruction.shape[-1]} — sig must be exactly "
            "n_frames * block_size samples"
        )
    target = target.astype(jnp.float32)
    reconstruction = reconstruction.astype(jnp.float32)
    ori = multiscale_fft(target, scales, overlap)
    rec = multiscale_fft(reconstruction, scales, overlap)
    return multiscale_spec_loss(ori, rec), ori, rec
