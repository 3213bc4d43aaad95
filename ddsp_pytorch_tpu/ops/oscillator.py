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
  * pure-XLA path (`_harmonic_synth_frames_xla`): Chebyshev-recurrence bank
    (sin/cos computed ONCE per sample, then K FMA recurrence steps — the
    same trick as the Pallas kernel, at the XLA level) with a custom VJP
    that recomputes the recurrences in the backward instead of storing the
    (B, F, S, K) chain.  2 transcendentals per sample instead of K makes
    this path ~10x faster than the direct sin bank on CPU (the reference's
    own deployment target) and no less accurate (the recurrence tracks the
    f64 oracle as tightly as f32 sin does — tests/test_oscillator.py).
    `_harmonic_synth_frames_xla_direct` keeps the direct K-chunked sin bank
    as the independent oracle the recurrence is tested against.
  * Pallas path (`ops/pallas_kernels/oscillator.py`): fused kernel that never
    materializes the harmonic axis in HBM; custom VJP recomputes sines.
"""

from __future__ import annotations

import functools
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


def _harmonic_synth_frames_xla_direct(
    f0: jax.Array,
    amplitudes: jax.Array,
    phi: jax.Array,
    block_size: int,
    sample_rate: float,
    k_chunk: int = 16,
) -> jax.Array:
    """Direct-sin frame-factored oscillator bank (the independent oracle
    the Chebyshev path is tested against; K-chunked to bound the
    materialized (B, F, S, Kc) intermediate, rematerialized in backward).

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


def _base_phase(f0, phi, block_size, sample_rate):
    """(B, F) → (B, F, S) in-frame fundamental phase θ = φ + (i+1)·ω."""
    omega = (2.0 * math.pi / sample_rate) * f0
    ramp = jnp.arange(1, block_size + 1, dtype=f0.dtype)
    return phi[..., None] + omega[..., None] * ramp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _harmonic_synth_frames_xla(f0, amplitudes, phi, block_size, sample_rate):
    """Chebyshev-recurrence oscillator bank (XLA path).

    y = Σ_k a_k·sin(k·θ) via  s_{k+1} = 2cos(θ)·s_k − s_{k−1}:
    2 transcendentals per sample instead of K, the rest FMAs.  The unrolled
    loop fuses into a single XLA elementwise pass (the scan variant would
    round-trip 3 carries through memory per step).  Custom VJP below
    recomputes both recurrences instead of storing the K-deep chain.
    """
    theta = _base_phase(f0, phi, block_size, sample_rate)
    s1 = jnp.sin(theta)
    two_c = 2.0 * jnp.cos(theta)
    b, f = f0.shape
    k = amplitudes.shape[-1]
    s_prev = jnp.zeros_like(s1)
    s_curr = s1
    acc = jnp.zeros_like(s1)
    for j in range(k):
        acc = acc + amplitudes[..., j][..., None] * s_curr
        s_prev, s_curr = s_curr, two_c * s_curr - s_prev
    return acc.reshape(b, f * block_size)


def _cheb_fwd(f0, amplitudes, phi, block_size, sample_rate):
    out = _harmonic_synth_frames_xla(
        f0, amplitudes, phi, block_size, sample_rate
    )
    return out, (f0, amplitudes, phi)


def _cheb_bwd(block_size, sample_rate, res, g):
    """Analytical backward, recurrences recomputed:

      dā_k   = Σ_s g·sin(k·θ)
      dθ     = g · Σ_k a_k·k·cos(k·θ)
      dφ     = Σ_s dθ;   df0 = (2π/sr)·Σ_s dθ·(i+1)
    """
    f0, amplitudes, phi = res
    b, f = f0.shape
    k = amplitudes.shape[-1]
    theta = _base_phase(f0, phi, block_size, sample_rate)
    g3 = g.reshape(b, f, block_size)
    s1 = jnp.sin(theta)
    c1 = jnp.cos(theta)
    two_c = 2.0 * c1
    s_prev, s_curr = jnp.zeros_like(s1), s1
    c_prev, c_curr = jnp.ones_like(c1), c1
    da = []
    dtheta_fac = jnp.zeros_like(s1)
    for j in range(k):
        da.append(jnp.sum(g3 * s_curr, axis=-1))  # (B, F)
        kf = jnp.asarray(j + 1, s1.dtype)
        dtheta_fac = dtheta_fac + amplitudes[..., j][..., None] * kf * c_curr
        s_prev, s_curr = s_curr, two_c * s_curr - s_prev
        c_prev, c_curr = c_curr, two_c * c_curr - c_prev
    dtheta = g3 * dtheta_fac
    dphi = jnp.sum(dtheta, axis=-1)
    ramp = jnp.arange(1, block_size + 1, dtype=s1.dtype)
    df0 = (2.0 * math.pi / sample_rate) * jnp.sum(dtheta * ramp, axis=-1)
    damp = jnp.stack(da, axis=-1)
    return df0, damp, dphi


_harmonic_synth_frames_xla.defvjp(_cheb_fwd, _cheb_bwd)


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
