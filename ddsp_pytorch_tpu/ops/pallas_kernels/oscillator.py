"""Fused harmonic-oscillator-bank Pallas kernel.

Replaces the reference's hot loop #1 (ddsp/core.py:136-141: cumsum over T
samples + sin over a materialized (B, T, K) tensor + reduce — SURVEY.md §3.1).

Design (see ops/oscillator.py for the frame-factored phase math):

* Controls are flattened to independent rows (one row = one frame of one
  batch item): phi/omega (R, 1), amplitudes (R, K) → audio (R, S).  Rows
  never interact, so the grid simply tiles rows; batch and frame axes fuse.
* Inside a tile, sin(k·θ) for k = 1..K is generated with the Chebyshev
  angle-addition recurrence  sin kθ = 2cosθ·sin((k−1)θ) − sin((k−2)θ),
  so the whole bank costs 1 sin + 1 cos + ~2K FMAs per sample on the VPU
  instead of K transcendentals — and the (tile, S, K) sin tensor never
  exists anywhere, not even in VMEM (only three (tile, S) registers roll).
* The backward pass is a second kernel sharing the recurrence (cos kθ twin),
  recomputing sines instead of storing them: d amp = ⟨g, sin kθ⟩ per frame,
  dθ = Σ_k k·amp_k·cos(kθ)·g, folded to dphi/domega per frame in-kernel.
  f32 everywhere: phase precision is the binding constraint (SURVEY.md §7).

HBM traffic per tile: read (S+K+2) floats/row, write S floats/row — within
~2× of the unavoidable audio-out bytes, i.e. near speed-of-light for a
memory-bound op.  FLOPs ≈ 4·R·S·K ≪ VPU roofline at these sizes.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Rows (= frames) per grid cell.  32 rows × 512 samples × f32 = 64 KB per
# rolling register array; ~6 live arrays ≈ 0.4 MB of VMEM — comfortable.
_TILE_R = 32


def _fwd_kernel(phi_ref, omega_ref, amp_ref, out_ref, *, n_harmonic, block_size):
    # (1, S): in-frame sample index, 1-based (inclusive-cumsum parity).
    # Mosaic's iota is integer-only; cast after.
    ramp = (
        jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1).astype(jnp.float32)
        + 1.0
    )
    base = phi_ref[:] + omega_ref[:] * ramp  # (R_t, S) fundamental phase
    sin_prev = jnp.sin(base)  # sin(1·θ)
    two_cos = 2.0 * jnp.cos(base)
    acc = amp_ref[:, 0:1] * sin_prev
    sin_prev2 = jnp.zeros_like(sin_prev)  # sin(0·θ)
    for k in range(2, n_harmonic + 1):
        sin_k = two_cos * sin_prev - sin_prev2
        acc = acc + amp_ref[:, k - 1 : k] * sin_k
        sin_prev2, sin_prev = sin_prev, sin_k
    out_ref[:] = acc


def _bwd_kernel(
    phi_ref, omega_ref, amp_ref, g_ref, dphi_ref, domega_ref, damp_ref,
    *, n_harmonic, block_size,
):
    ramp = (
        jax.lax.broadcasted_iota(jnp.int32, (1, block_size), 1).astype(jnp.float32)
        + 1.0
    )
    base = phi_ref[:] + omega_ref[:] * ramp
    g = g_ref[:]

    sin_k = jnp.sin(base)
    cos_k = jnp.cos(base)
    two_cos = 2.0 * cos_k
    sin_prev = jnp.zeros_like(sin_k)  # sin((k-1)θ) trail
    cos_prev = jnp.ones_like(cos_k)  # cos(0·θ)

    dtheta = amp_ref[:, 0:1] * cos_k * g
    damp_ref[:, 0:1] = jnp.sum(g * sin_k, axis=-1, keepdims=True)
    for k in range(2, n_harmonic + 1):
        sin_next = two_cos * sin_k - sin_prev
        cos_next = two_cos * cos_k - cos_prev
        sin_prev, sin_k = sin_k, sin_next
        cos_prev, cos_k = cos_k, cos_next
        damp_ref[:, k - 1 : k] = jnp.sum(g * sin_k, axis=-1, keepdims=True)
        dtheta = dtheta + float(k) * amp_ref[:, k - 1 : k] * cos_k * g

    dphi_ref[:] = jnp.sum(dtheta, axis=-1, keepdims=True)
    domega_ref[:] = jnp.sum(dtheta * ramp, axis=-1, keepdims=True)


def _vma(*xs):
    """Union of the inputs' varying-mesh-axes, for pallas_call out_shapes.

    Inside jax.shard_map (the time-sharded synthesis path, parallel/ops.py)
    every aval carries a `vma` set and pallas_call outputs must declare
    theirs (JAX ≥0.9 check_vma); the kernel's outputs vary exactly over the
    axes its inputs vary over.  Outside shard_map this is the empty set.
    """
    typeof = getattr(jax, "typeof", None)
    if typeof is None:  # pre-vma JAX: the check does not exist there
        return None
    out = frozenset()
    for x in xs:
        out = out | getattr(typeof(x), "vma", frozenset())
    return out


def _sds(shape, vma):
    """ShapeDtypeStruct with vma, omitting the kwarg on pre-vma JAX
    (where _vma returns None and ShapeDtypeStruct lacks the argument)."""
    if vma is None:
        return jax.ShapeDtypeStruct(shape, jnp.float32)
    return jax.ShapeDtypeStruct(shape, jnp.float32, vma=vma)


def _row_specs(n_harmonic, block_size):
    row = lambda i: (i, 0)
    return dict(
        phi=pl.BlockSpec((_TILE_R, 1), row, memory_space=pltpu.VMEM),
        omega=pl.BlockSpec((_TILE_R, 1), row, memory_space=pltpu.VMEM),
        amp=pl.BlockSpec((_TILE_R, n_harmonic), row, memory_space=pltpu.VMEM),
        audio=pl.BlockSpec((_TILE_R, block_size), row, memory_space=pltpu.VMEM),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _osc_rows(phi, omega, amp, block_size, interpret):
    """(R, 1), (R, 1), (R, K) → (R, S) audio.  R must be a _TILE_R multiple."""
    return _osc_rows_fwd(phi, omega, amp, block_size, interpret)[0]


def _osc_rows_fwd(phi, omega, amp, block_size, interpret):
    rows, n_harmonic = amp.shape
    specs = _row_specs(n_harmonic, block_size)
    flops_per_row = 4 * block_size * n_harmonic
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, n_harmonic=n_harmonic, block_size=block_size
        ),
        grid=(rows // _TILE_R,),
        in_specs=[specs["phi"], specs["omega"], specs["amp"]],
        out_specs=specs["audio"],
        out_shape=_sds((rows, block_size), _vma(phi, omega, amp)),
        cost_estimate=pl.CostEstimate(
            flops=rows * flops_per_row,
            bytes_accessed=4 * rows * (2 * block_size + n_harmonic + 2),
            transcendentals=2 * rows * block_size,
        ),
        interpret=interpret,
    )(phi, omega, amp)
    return out, (phi, omega, amp)


def _osc_rows_bwd(block_size, interpret, residuals, g):
    phi, omega, amp = residuals
    rows, n_harmonic = amp.shape
    specs = _row_specs(n_harmonic, block_size)
    vma = _vma(phi, omega, amp, g)
    dphi, domega, damp = pl.pallas_call(
        functools.partial(
            _bwd_kernel, n_harmonic=n_harmonic, block_size=block_size
        ),
        grid=(rows // _TILE_R,),
        in_specs=[specs["phi"], specs["omega"], specs["amp"], specs["audio"]],
        out_specs=(specs["phi"], specs["omega"], specs["amp"]),
        out_shape=(
            _sds((rows, 1), vma),
            _sds((rows, 1), vma),
            _sds((rows, n_harmonic), vma),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * rows * block_size * n_harmonic,
            bytes_accessed=4 * rows * (3 * block_size + 2 * n_harmonic + 4),
            transcendentals=2 * rows * block_size,
        ),
        interpret=interpret,
    )(phi, omega, amp, g.astype(jnp.float32))
    return dphi, domega, damp


_osc_rows.defvjp(_osc_rows_fwd, _osc_rows_bwd)


def harmonic_synth_pallas(
    f0: jax.Array,
    amplitudes: jax.Array,
    phi: jax.Array,
    block_size: int,
    sample_rate: float,
    *,
    interpret: bool = False,
) -> jax.Array:
    """Fused oscillator bank from frame-rate controls.

    Args:
      f0: (B, F) Hz.  amplitudes: (B, F, K).  phi: (B, F) frame-start phases
        (from ops.oscillator.phase_accumulate_frames — differentiable XLA, so
        d f0 flows through both phi and omega).
    Returns:
      (B, F * block_size) f32 audio.
    """
    b, f = f0.shape
    k = amplitudes.shape[-1]
    omega = (2.0 * math.pi / sample_rate) * f0

    rows = b * f
    pad = (-rows) % _TILE_R
    flat = lambda x, width: jnp.pad(
        x.reshape(rows, width).astype(jnp.float32), ((0, pad), (0, 0))
    )
    audio = _osc_rows(
        flat(phi, 1), flat(omega, 1), flat(amplitudes, k), block_size, interpret
    )
    return audio[:rows].reshape(b, f * block_size)
