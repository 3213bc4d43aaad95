"""Time-axis-sharded DSP ops: distributed phase scan, halo'd convolution,
sharded multi-scale STFT loss.

No reference analogue (the reference chunks offline and runs single-device —
SURVEY.md §5 long-context).  These ops let one long audio signal span many
chips along the mesh's 'time' axis:

  * sharded_phase_offsets / sharded_harmonic_synth — the oscillator's phase
    cumsum becomes a distributed exclusive scan: local frame cumsum + an
    exclusive scan of per-shard phase totals over ICI (one small all_gather),
    then the local (Pallas) oscillator runs unchanged.  Phases are wrapped
    mod 2π at every level, so results match the unsharded op to f32 accuracy
    regardless of shard count.
  * sharded_fft_convolve_causal — overlap-scatter block convolution for the
    reverb: each time shard convolves its chunk with the IR locally (FFT),
    keeps its own span, and ppermutes the overflowing tail to the shards it
    bleeds into (⌈(L−1)/C⌉ neighbor hops).
  * sharded_multiscale_spec_loss — STFT frames that straddle shard edges get
    (n_fft/2)-sample halos from both neighbors (ppermute); global reflect
    padding is reconstructed locally at the outer shards; per-scale L1 sums
    are psum'd so the sharded loss equals the unsharded loss exactly.

All functions take *sharded* arrays (time axis split over 'time') inside a
shard_map context, or provide a `.wrap(mesh)` helper that builds the
shard_map for you.  Used by parallel/longform.py and the multichip dry run.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ddsp_pytorch_tpu.ops.fft import irfft, rfft
from ddsp_pytorch_tpu.ops.oscillator import harmonic_synth_frames
from ddsp_pytorch_tpu.ops.spectral import frame_signal, hann_window

try:  # JAX ≥ 0.6 exposes shard_map at the top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def checked_shard_map(fn, *, mesh, in_specs, out_specs, check=True):
    """shard_map with the replication check flag spelled for this JAX
    version (check_vma on ≥0.9, check_rep on the experimental fallback).

    check=False is needed wherever the mapped fn runs a Pallas kernel in
    *interpret* mode (JAX's hlo_interpreter is not vma-clean); the compiled
    kernel declares its vma (pallas_kernels/oscillator.py) and keeps the
    check on.
    """
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check,
        )
    except TypeError:  # pragma: no cover — older JAX spells it check_rep
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=check,
        )


TWO_PI = 2.0 * math.pi


# ----------------------------------------------------------- phase scan


def sharded_phase_offsets(f0_local: jax.Array, block_size: int, sample_rate: float,
                          axis: str = "time"):
    """Distributed exclusive phase scan (inside shard_map).

    f0_local: (B, F_local) — this shard's frames.
    Returns (phi_local (B, F_local), phase_out (B,)): wrapped frame-start
    phases with the cross-shard offset applied, and this shard's outgoing
    phase (for streaming hand-off).
    """
    dphi = jnp.mod(block_size * TWO_PI * f0_local / sample_rate, TWO_PI)
    inc = jnp.cumsum(dphi, axis=-1)  # inclusive local scan
    local_total = jnp.mod(inc[..., -1], TWO_PI)  # (B,)

    # exclusive scan of shard totals over the time axis (small: (B,) each)
    totals = jax.lax.all_gather(local_total, axis)  # (n_shards, B)
    my = jax.lax.axis_index(axis)
    n = jax.lax.axis_size(axis)
    mask = (jnp.arange(n) < my).astype(totals.dtype)  # strictly-left shards
    offset = jnp.mod(jnp.sum(totals * mask[:, None], axis=0), TWO_PI)  # (B,)

    phi_excl = jnp.mod(inc - dphi, TWO_PI)  # exclusive local prefix
    phi = jnp.mod(phi_excl + offset[..., None], TWO_PI)
    phase_out = jnp.mod(local_total + offset, TWO_PI)
    return phi, phase_out


def sharded_harmonic_synth(
    f0_local: jax.Array,
    amp_local: jax.Array,
    block_size: int,
    sample_rate: float,
    axis: str = "time",
    use_pallas: str = "auto",
) -> jax.Array:
    """Time-sharded oscillator bank (inside shard_map).

    f0_local (B, F_local), amp_local (B, F_local, K) → (B, F_local*S) local
    audio.  Exactly the unsharded result on each shard's span.
    """
    phi, _ = sharded_phase_offsets(f0_local, block_size, sample_rate, axis)
    # Local synthesis with pre-offset phi: the single-chip backend dispatch
    # (ops/oscillator.py synth_from_phases) is reused verbatim, so the
    # sharded and unsharded paths can never pick different kernels.
    from ddsp_pytorch_tpu.ops.oscillator import synth_from_phases

    return synth_from_phases(
        f0_local, amp_local, phi, block_size, sample_rate, use_pallas
    )


# ------------------------------------------------- halo'd causal convolution


def sharded_fft_convolve_causal(
    x_local: jax.Array, ir: jax.Array, axis: str = "time"
) -> jax.Array:
    """Causal linear convolution of a time-sharded signal with a replicated
    IR (inside shard_map).  out[t] = Σ_{τ≤t} ir[τ]·x[t−τ].

    x_local: (B, C) this shard's chunk; ir: (L,) replicated.
    Each shard convolves locally (length C+L−1), keeps [0, C), and sends
    the tail in C-sized pieces to the next ⌈(L−1)/C⌉ right neighbors.

    Matches ops.fft_convolve(x, pad(ir, T))'s causal semantics (see
    tests/test_parallel.py) — the reverb path (modules.py Reverb).
    """
    b, c = x_local.shape
    l = ir.shape[-1]
    n_fft = 1 << int(np.ceil(np.log2(c + l)))
    # ops.fft wrappers: differentiable inside shard_map with check_vma on
    full = irfft(
        rfft(x_local, n_fft) * rfft(ir, n_fft)[None, :], n_fft
    )[:, : c + l - 1]

    out = full[:, :c]
    n_shards = jax.lax.axis_size(axis)
    # tail pieces beyond the last shard fall off the end of the signal
    n_hops = min(-(-(l - 1) // c), n_shards - 1)  # ceil((L-1)/C), clamped
    for k in range(1, n_hops + 1):
        piece = full[:, k * c : (k + 1) * c]
        piece = jnp.pad(piece, ((0, 0), (0, c - piece.shape[-1])))
        # send k shards to the right; shards with no source receive zeros
        perm = [(j, j + k) for j in range(n_shards - k)]
        shifted = jax.lax.ppermute(piece, axis, perm)
        out = out + shifted
    return out


# ------------------------------------------------- sharded multiscale loss


def reflect_tail_into_pad(
    x_local: jax.Array, t_valid: int, axis: str = "time"
) -> jax.Array:
    """Overwrite this shard's samples at global index g ≥ t_valid with the
    signal's reflection about its true end (inside shard_map): the result on
    [t_valid, T_pad) equals jnp.pad(x[:t_valid], mode='reflect') —
    out[t_valid + k] = x[t_valid - 2 - k].

    This is how pad-and-mask time sharding reproduces torch.stft's
    center=True reflect padding (reference core.py:27-41) at the TRUE signal
    boundary when the sharded signal is padded to T_pad > t_valid for shape
    divisibility.  Requires the pad region and its reflection sources to
    live on the LAST time shard — training/time_sharded.plan_time_padding
    guarantees and validates this.  Differentiable: the gather's transpose
    scatters pad-region cotangents back onto interior samples, exactly as
    jnp.pad 'reflect' does in the unsharded loss.
    """
    b, c = x_local.shape
    n = jax.lax.axis_size(axis)
    t_pad = n * c
    if t_valid >= t_pad:
        return x_local
    last_start = (n - 1) * c
    g = last_start + np.arange(c)
    src = np.where(g >= t_valid, 2 * (t_valid - 1) - g, g) - last_start
    if src.min() < 0:
        raise ValueError(
            f"reflect_tail_into_pad: reflection sources reach below the last "
            f"shard (t_valid={t_valid}, chunk={c}, shards={n}); the time "
            f"padding plan must keep 2*t_valid - T_pad - 1 >= (n-1)*chunk"
        )
    j = jax.lax.axis_index(axis)
    reflected = x_local[:, src]
    return jnp.where(j == n - 1, reflected, x_local)


def _edge_reflect(chunk: jax.Array, pad: int, side: str) -> jax.Array:
    """Reflect padding of a global edge computed from the edge shard's own
    samples (matches jnp.pad mode='reflect')."""
    if side == "left":
        return chunk[:, 1 : pad + 1][:, ::-1]
    return chunk[:, -pad - 1 : -1][:, ::-1]


def _halo_exchange(x_local: jax.Array, pad: int, axis: str) -> jax.Array:
    """Extend the local chunk with `pad` samples from each neighbor
    (global edges use reflect padding).  (B, C) → (B, C + 2*pad)."""
    n = jax.lax.axis_size(axis)
    j = jax.lax.axis_index(axis)
    right_perm = [(i, i + 1) for i in range(n - 1)]  # data flows rightward
    left_perm = [(i + 1, i) for i in range(n - 1)]
    from_left = jax.lax.ppermute(x_local[:, -pad:], axis, right_perm)
    from_right = jax.lax.ppermute(x_local[:, :pad], axis, left_perm)
    from_left = jnp.where(j == 0, _edge_reflect(x_local, pad, "left"), from_left)
    from_right = jnp.where(
        j == n - 1, _edge_reflect(x_local, pad, "right"), from_right
    )
    return jnp.concatenate([from_left, x_local, from_right], axis=-1)


def sharded_scale_mags(
    x_local: jax.Array, n_fft: int, hop: int, axis: str = "time",
    t_valid: Optional[int] = None,
) -> tuple:
    """Magnitude STFT frames owned by this shard (inside shard_map).

    Returns (mags (B, n_loc, bins), valid (n_loc,) mask).  The global frame
    set (center=True on a length-t_valid signal: 1 + t_valid//hop frames) is
    partitioned by frame center; each shard owns the frames centered inside
    its chunk plus a +1 boundary slot that is valid only where it is not a
    duplicate of the right neighbor's frame 0.  With t_valid < T_pad
    (pad-and-mask time sharding), frames centered beyond the true signal end
    are masked out.  Requires C % hop == 0 and n_fft//2 ≤ C.
    """
    b, c = x_local.shape
    pad = n_fft // 2
    if c % hop != 0:
        raise ValueError(
            f"time-shard chunk ({c}) must be a multiple of the STFT hop "
            f"({hop}); choose a shard count dividing T/hop"
        )
    if pad >= c:  # edge reflect needs pad ≤ C-1
        raise ValueError(
            f"n_fft/2 ({pad}) must be smaller than the time-shard chunk "
            f"({c}); use fewer time shards or smaller FFT scales"
        )
    ext = _halo_exchange(x_local, pad, axis)
    n_loc = c // hop + 1  # +1 slot: only the last shard's is globally valid
    # frame_signal on the halo-extended chunk yields exactly n_loc frames:
    # 1 + (c + 2*pad - n_fft)//hop = 1 + c//hop  (2*pad == n_fft)
    frames = frame_signal(ext, n_fft, hop)
    win = hann_window(n_fft, dtype=x_local.dtype)
    spec = rfft(frames * win)
    mags = jnp.abs(spec) * (1.0 / np.sqrt(n_fft))  # torch normalized=True

    n = jax.lax.axis_size(axis)
    j = jax.lax.axis_index(axis)
    if t_valid is None:
        t_valid = n * c
    centers = j * c + jnp.arange(n_loc) * hop  # global frame centers
    is_last = j == n - 1
    owned = jnp.concatenate(
        [jnp.ones((n_loc - 1,), bool), is_last[None]]
    )
    valid = (owned & (centers <= t_valid)).astype(x_local.dtype)
    return mags, valid


def sharded_multiscale_spec_loss(
    target_local: jax.Array,
    recon_local: jax.Array,
    scales: Sequence[int],
    overlap: float,
    axis: str = "time",
    batch_axis: Optional[str] = "data",
    t_valid: Optional[int] = None,
) -> jax.Array:
    """Sharded multi-scale spectral loss (inside shard_map) == the unsharded
    training loss (training/loss.py) on the gathered signal.

    Reduces over the time shards AND (if batch_axis given) the data shards,
    so the scalar is the global batch mean, replicated on every device.
    With t_valid set (pad-and-mask time sharding), frames centered beyond
    the true signal end are excluded and the mean normalizes by the
    unsharded frame count 1 + t_valid//hop; the caller must have written
    the reflection about t_valid into both signals' pad regions
    (reflect_tail_into_pad) so valid edge frames match the unsharded
    center-reflect STFT exactly.
    """
    total = jnp.asarray(0.0, jnp.float32)
    b = target_local.shape[0]
    n = jax.lax.axis_size(axis)
    c = target_local.shape[-1]
    reduce_axes = (axis,) if batch_axis is None else (axis, batch_axis)
    b_global = b if batch_axis is None else b * jax.lax.axis_size(batch_axis)
    t_total = n * c if t_valid is None else t_valid
    for s in scales:
        hop = int(s * (1.0 - overlap))
        mags_t, valid = sharded_scale_mags(target_local, s, hop, axis, t_valid)
        mags_r, _ = sharded_scale_mags(recon_local, s, hop, axis, t_valid)
        w = valid[None, :, None]
        lin_sum = jnp.sum(jnp.abs(mags_t - mags_r) * w)
        log_sum = jnp.sum(
            jnp.abs(jnp.log(mags_t + 1e-7) - jnp.log(mags_r + 1e-7)) * w
        )
        lin_sum = jax.lax.psum(lin_sum, reduce_axes)
        log_sum = jax.lax.psum(log_sum, reduce_axes)
        bins = s // 2 + 1
        n_frames_global = 1 + t_total // hop
        count = b_global * bins * n_frames_global
        total = total + (lin_sum + log_sum) / count
    return total


# ------------------------------------------------------------ wrappers


def make_time_sharded_synth(
    mesh: Mesh, block_size: int, sample_rate: float, use_pallas: str = "auto"
):
    """jit-able (f0 (B, F), amp (B, F, K)) → (B, T) with F sharded over
    'time' and B over 'data'.

    The compiled Pallas kernel declares its outputs' varying mesh axes
    (pallas_kernels/oscillator.py _vma), so check_vma stays on; Pallas
    *interpret* mode (CPU tests) trips a check inside JAX's own
    hlo_interpreter, so that combination turns the check off.
    """

    def fn(f0, amp):
        return sharded_harmonic_synth(
            f0, amp, block_size, sample_rate, use_pallas=use_pallas
        )

    return checked_shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", "time"), P("data", "time", None)),
        out_specs=P("data", "time"),
        check=use_pallas != "interpret",
    )


def make_time_sharded_loss(
    mesh: Mesh, scales: Sequence[int], overlap: float,
    t_valid: Optional[int] = None,
):
    """jit-able (target (B, T), recon (B, T)) → scalar loss, T over 'time'."""

    def fn(t, r):
        return sharded_multiscale_spec_loss(
            t, r, scales, overlap, t_valid=t_valid
        )

    return shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", "time"), P("data", "time")),
        out_specs=P(),
    )


def make_time_sharded_reverb(mesh: Mesh):
    """jit-able (x (B, T), ir (L,)) → (B, T), T over 'time', ir replicated."""

    def fn(x, ir):
        return sharded_fft_convolve_causal(x, ir)

    return shard_map(
        fn, mesh=mesh, in_specs=(P("data", "time"), P()), out_specs=P("data", "time")
    )
