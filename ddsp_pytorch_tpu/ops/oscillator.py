"""Harmonic oscillator bank — the hot synthesis kernel.

Behavioral parity target: reference ddsp/core.py:136-141 (`harmonic_synth`):
per-sample f0 → instantaneous phase via cumsum(2π f0/sr) over time → sin of
each integer harmonic multiple, weighted by per-harmonic amplitude envelopes,
summed over harmonics.

TPU-native design
-----------------
The reference materializes the (B, T, K) sin matrix (192 000 samples × 64
harmonics — its main memory hog, SURVEY.md §3.1 hot loop #1).  Here the
computation is *frame-factored*: control signals live at frame rate (T = F·S
samples, S = block_size), and nearest-neighbor upsampling means f0 is
constant within each frame.  The phase therefore decomposes exactly as

    phase[b, j·S + i] = Φ[b, j] + (i+1) · 2π f0[b,j] / sr
    Φ[b, j] = Σ_{m<j} S · 2π f0[b,m] / sr          (exclusive frame cumsum)

so the O(T) sequential cumsum of the reference collapses to an O(F) cumsum
(F = 375 vs T = 192 000) plus a closed-form in-frame ramp.  This is both
faster (the cumsum is the only sequential dependency) and *more accurate in
f32*: Φ is wrapped mod 2π before broadcast — valid because harmonics are
integer multiples, so sin(k·(Φ mod 2π + x)) == sin(k·(Φ + x)).

Two execution paths:
  * pure-XLA path (`_harmonic_synth_frames_xla`): K-chunked to bound the
    materialized (B, F, S, Kc) intermediate, rematerialized in the backward.
  * Pallas path (`ops/pallas_kernels/oscillator.py`): fused kernel that never
    materializes the harmonic axis in HBM; custom VJP recomputes sines.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def phase_accumulate_frames(
    f0: jax.Array, block_size: int, sample_rate: float, phase0=None
) -> tuple:
    """Frame-boundary phases for frame-rate f0.

    Args:
      f0: (B, F) fundamental frequency per frame, Hz.
      phase0: optional (B,) starting phase (streaming carry), radians.

    Returns:
      (phi, phase_out): phi (B, F) wrapped phase at the *start* of each frame
      (exclusive cumsum), and phase_out (B,) wrapped phase after the last
      sample — the carry for streaming synthesis.
    """
    omega = 2.0 * math.pi * f0 / sample_rate  # per-sample increment per frame
    dphi = block_size * omega
    # Exclusive cumsum of frame increments; wrap mod 2π to keep f32 exact.
    inc = jnp.cumsum(jnp.mod(dphi, 2.0 * math.pi), axis=-1)
    phi = jnp.mod(
        jnp.pad(inc[..., :-1], [(0, 0)] * (inc.ndim - 1) + [(1, 0)]), 2.0 * math.pi
    )
    if phase0 is not None:
        phi = jnp.mod(phi + phase0[..., None], 2.0 * math.pi)
        phase_out = jnp.mod(inc[..., -1] + phase0, 2.0 * math.pi)
    else:
        phase_out = jnp.mod(inc[..., -1], 2.0 * math.pi)
    return phi, phase_out


def _harmonic_synth_frames_xla(
    f0: jax.Array,
    amplitudes: jax.Array,
    phi: jax.Array,
    block_size: int,
    sample_rate: float,
    k_chunk: int = 16,
) -> jax.Array:
    """Pure-XLA frame-factored oscillator bank.

    Args:
      f0: (B, F) Hz. amplitudes: (B, F, K). phi: (B, F) frame-start phases.
    Returns:
      (B, F*S) audio.
    """
    b, f = f0.shape
    k = amplitudes.shape[-1]
    omega = (2.0 * math.pi / sample_rate) * f0  # (B, F)
    ramp = jnp.arange(1, block_size + 1, dtype=f0.dtype)  # (S,)
    # in-frame fundamental phase: (B, F, S)
    base_phase = phi[..., None] + omega[..., None] * ramp

    def chunk_term(k0, kc):
        ks = jnp.arange(k0 + 1, k0 + kc + 1, dtype=f0.dtype)  # (Kc,)
        # (B, F, S, Kc) — bounded by k_chunk; recomputed in backward.
        sines = jnp.sin(base_phase[..., None] * ks)
        amp = amplitudes[..., k0 : k0 + kc]  # (B, F, Kc)
        return jnp.einsum("bfsk,bfk->bfs", sines, amp)

    chunk_term = jax.checkpoint(chunk_term, static_argnums=(0, 1))

    out = jnp.zeros((b, f, block_size), f0.dtype)
    for k0 in range(0, k, k_chunk):
        out = out + chunk_term(k0, min(k_chunk, k - k0))
    return out.reshape(b, f * block_size)


def synth_from_phases(
    f0: jax.Array,
    amplitudes: jax.Array,
    phi: jax.Array,
    block_size: int,
    sample_rate: float,
    use_pallas: str = "auto",
) -> jax.Array:
    """Backend dispatch for the frame-factored bank, given precomputed
    frame-start phases (the single home of the use_pallas rule — shared by
    harmonic_synth_frames and the time-sharded parallel/ops path, whose phi
    carries the cross-shard offset)."""
    backend = jax.default_backend()
    wants_pallas = use_pallas in ("always", "interpret") or (
        use_pallas == "auto" and backend == "tpu"
    )
    if wants_pallas:
        from ddsp_pytorch_tpu.ops.pallas_kernels.oscillator import (
            harmonic_synth_pallas,
        )

        return harmonic_synth_pallas(
            f0, amplitudes, phi, block_size, float(sample_rate),
            interpret=use_pallas == "interpret",
        )
    return _harmonic_synth_frames_xla(
        f0, amplitudes, phi, block_size, float(sample_rate)
    )


def harmonic_synth_frames(
    f0: jax.Array,
    amplitudes: jax.Array,
    block_size: int,
    sample_rate: float,
    *,
    phase0: jax.Array | None = None,
    return_phase: bool = False,
    use_pallas: str = "auto",
):
    """Harmonic bank from frame-rate controls (the framework-native API).

    Args:
      f0: (B, F) or (B, F, 1) frame-rate fundamental, Hz.
      amplitudes: (B, F, K) frame-rate per-harmonic amplitudes (already
        masked/normalized/scaled by the caller — see models/modules.py).
      phase0: optional (B,) phase carry for streaming.
      use_pallas: 'auto' (TPU only), 'never', 'always', or 'interpret'
        (the Pallas kernel in interpreter mode — CPU tests of the kernel
        wiring, e.g. inside shard_map).

    Returns:
      (B, F*block_size) audio; optionally (audio, phase_out).
    """
    if f0.ndim == 3:
        f0 = f0[..., 0]
    phi, phase_out = phase_accumulate_frames(f0, block_size, sample_rate, phase0)
    audio = synth_from_phases(
        f0, amplitudes, phi, block_size, sample_rate, use_pallas
    )
    if return_phase:
        return audio, phase_out
    return audio


def harmonic_synth(
    f0: jax.Array, amplitudes: jax.Array, sample_rate: float
) -> jax.Array:
    """Sample-rate-API oscillator bank (reference core.py:136-141 signature).

    Args:
      f0: (B, T, 1) per-sample fundamental, Hz.
      amplitudes: (B, T, K) per-sample harmonic amplitudes.
    Returns:
      (B, T, 1) audio.

    This is the literal formulation — an O(T) cumsum then sin bank.  The
    frame-factored `harmonic_synth_frames` is the production path; this one
    exists for API parity and as the test oracle at small sizes.
    """
    n_harmonic = amplitudes.shape[-1]
    omega = jnp.cumsum(2.0 * math.pi * f0 / sample_rate, axis=1)
    ks = jnp.arange(1, n_harmonic + 1, dtype=f0.dtype)
    omegas = omega * ks  # (B, T, K)
    signal = jnp.sum(jnp.sin(omegas) * amplitudes, axis=-1, keepdims=True)
    return signal
