"""CREPE-architecture neural pitch tracker (JAX/flax).

Role parity: the reference's primary pitch path shells out to the CREPE
TensorFlow model (ddsp/core.py:100-119: 16 kHz frames, step_size = one block
in ms, ``viterbi=True``, center padding, drop-last + re-interpolation to
``len(signal)//block_size`` frames).  This framework ships two trackers:

* ops/pitch.py — a classical YIN+Viterbi estimator (no learned weights), the
  default for preprocessing;
* this module — the CREPE convnet *architecture* (Kim et al. 2018) as a flax
  module, trained from scratch on synthesized audio with known f0
  (scripts/train_crepe.py) — fully self-contained, no TensorFlow and no
  downloaded weights, and it runs batched on TPU.

The decode path matches CREPE's: 360 sigmoid salience bins spaced 20 cents
from C1 (32.70 Hz), local weighted-average refinement around the peak, and
optional Viterbi smoothing over the salience map (the reference always passes
viterbi=True).
"""

from __future__ import annotations

import functools
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

MODEL_SRATE = 16000  # CREPE operates on 16 kHz frames
FRAME_LENGTH = 1024  # 64 ms input window
N_BINS = 360
CENTS_PER_BIN = 20.0
# Bin 0 = 32.70 Hz (C1) on the cents-above-10Hz scale CREPE uses.
CENTS_OFFSET = 1200.0 * math.log2(32.70319566257483 / 10.0)

# capacity multiplier → per-layer filter counts × [32, 4, 4, 4, 8, 16]
CAPACITIES = {"micro": 1, "tiny": 4, "small": 8, "medium": 16, "large": 24,
              "full": 32}
_BASE_FILTERS = (32, 4, 4, 4, 8, 16)
_KERNELS = (512, 64, 64, 64, 64, 64)
_STRIDES = (4, 1, 1, 1, 1, 1)


def cents_grid() -> np.ndarray:
    """(360,) center of each salience bin, in cents above 10 Hz."""
    return CENTS_OFFSET + CENTS_PER_BIN * np.arange(N_BINS)


def cents_to_hz(cents: jax.Array) -> jax.Array:
    return 10.0 * 2.0 ** (cents / 1200.0)


def hz_to_cents(f0: jax.Array) -> jax.Array:
    return 1200.0 * jnp.log2(jnp.maximum(f0, 1e-6) / 10.0)


class CREPE(nn.Module):
    """(B, 1024) audio frames → (B, 360) pitch-salience logits.

    Six conv blocks (conv → ReLU → BatchNorm → maxpool → dropout) and a
    dense head, per the CREPE paper; `capacity` scales every layer's filter
    count.  Call with ``train=True`` (and rngs={'dropout': ...}, mutable
    ['batch_stats']) during training.  Returns *logits*; apply sigmoid for
    salience.
    """

    capacity: str = "tiny"
    dropout: float = 0.25
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, frames: jax.Array, train: bool = False) -> jax.Array:
        mult = CAPACITIES[self.capacity]
        # per-frame normalization, as in CREPE's preprocessing
        mean = jnp.mean(frames, axis=-1, keepdims=True)
        std = jnp.std(frames, axis=-1, keepdims=True)
        x = ((frames - mean) / jnp.maximum(std, 1e-6))[..., None]  # (B, T, 1)
        x = x.astype(self.dtype)
        for i, (base, kernel, stride) in enumerate(
            zip(_BASE_FILTERS, _KERNELS, _STRIDES)
        ):
            x = nn.Conv(
                base * mult,
                kernel_size=(kernel,),
                strides=(stride,),
                padding="SAME",
                dtype=self.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=not train,
                dtype=self.dtype,
                name=f"bn{i + 1}",
            )(x)
            x = nn.max_pool(x, window_shape=(2,), strides=(2,))
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = x.reshape(x.shape[0], -1)  # (B, 4 · 16·mult)
        logits = nn.Dense(N_BINS, dtype=self.dtype, name="classifier")(x)
        return logits.astype(jnp.float32)


# ---------------------------------------------------------------- decoding


def salience_to_cents(salience: jax.Array, window: int = 4) -> jax.Array:
    """(…, 360) salience → (…,) cents via CREPE's local weighted average.

    The average runs over ±`window` bins around the argmax (CREPE's
    to_local_average_cents).
    """
    grid = jnp.asarray(cents_grid(), jnp.float32)
    peak = jnp.argmax(salience, axis=-1)
    idx = peak[..., None] + jnp.arange(-window, window + 1)
    idx = jnp.clip(idx, 0, N_BINS - 1)
    w = jnp.take_along_axis(salience, idx, axis=-1)
    # clipped duplicate edge bins get zero weight (counted once)
    valid = (peak[..., None] + jnp.arange(-window, window + 1) == idx)
    w = jnp.where(valid, w, 0.0)
    return jnp.sum(w * grid[idx], axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1e-9
    )


def viterbi_cents(salience: jax.Array, switch_per_octave: float = 3.0):
    """(F, 360) salience → (F,) cents with Viterbi-smoothed peak selection.

    Same smoothing role as CREPE's viterbi=True (the reference always
    enables it, core.py:108): emission cost −log p with a per-octave jump
    penalty, then the local weighted average re-centred on the chosen path.
    """
    from ddsp_pytorch_tpu.ops.pitch import _viterbi

    emis = -jnp.log(jnp.clip(salience, 1e-6, 1.0))
    bins_per_octave = 1200.0 / CENTS_PER_BIN
    dist_oct = (
        np.abs(np.arange(N_BINS)[:, None] - np.arange(N_BINS)[None, :])
        / bins_per_octave
    )
    switch = jnp.asarray((switch_per_octave * dist_oct).astype(np.float32))
    path = _viterbi(emis, switch)
    # local average around the *path* bin instead of the raw argmax
    onehotish = jnp.where(
        jnp.abs(jnp.arange(N_BINS)[None, :] - path[:, None]) <= 4,
        salience,
        0.0,
    )
    return salience_to_cents(onehotish)


# ------------------------------------------------------- full extract path


@functools.lru_cache(maxsize=None)
def _resample_kernel(up: int, down: int, taps_per_phase: int = 32) -> np.ndarray:
    """Windowed-sinc anti-alias/interpolation FIR for rational resampling."""
    cutoff = 1.0 / max(up, down)  # in units of the upsampled Nyquist
    half = taps_per_phase * max(up, down) // 2
    n = np.arange(-half, half + 1)
    kernel = cutoff * np.sinc(cutoff * n) * np.hanning(2 * half + 1)
    return (kernel * up).astype(np.float32)


def resample_to_model_rate(signal: jax.Array, sample_rate: int) -> jax.Array:
    """(T,) at sample_rate → (T·16000/sr,) at 16 kHz (polyphase sinc).

    True polyphase evaluation: output q is an inner product of the ≤
    ⌈L/up⌉+1 *original-rate* input samples its sinc window touches — the
    zero-stuffed up-rate signal (up to 160× T) and the O(T·up·L) direct
    convolution over it never exist.  y[q] = Σ_i x[i]·k̃[i·up + P − q·down]
    (k̃ = flipped kernel, P = L//2), identical math to zero-stuff → conv
    'valid' → [::down], which at 44.1 kHz → 16 kHz would be ~1e12 MACs for
    a 15 s clip versus ~2e7 here."""
    if sample_rate == MODEL_SRATE:
        return signal
    g = math.gcd(int(sample_rate), MODEL_SRATE)
    up, down = MODEL_SRATE // g, sample_rate // g
    kernel = _resample_kernel(up, down)
    length = kernel.shape[0]
    pad = length // 2
    t = int(signal.shape[-1])
    t_out = -(-t * up // down)  # ceil: len(zero-stuffed conv output) / down

    flipped = kernel[::-1].copy()
    window = (length - 1) // up + 2  # inputs touching one output
    q = np.arange(t_out, dtype=np.int64)
    s = q * down - pad
    i0 = -((-s) // up)  # ceil(s / up): first input index with a valid tap
    i_mat = i0[:, None] + np.arange(window, dtype=np.int64)[None, :]
    j_mat = i_mat * up - s[:, None]  # tap index per (output, window slot)
    valid = (j_mat >= 0) & (j_mat < length) & (i_mat >= 0) & (i_mat < t)
    taps = np.where(
        valid, flipped[np.clip(j_mat, 0, length - 1)], 0.0
    ).astype(np.float32)
    idx = np.clip(i_mat, 0, t - 1)
    return jnp.einsum(
        "qw,qw->q", jnp.asarray(signal)[idx], jnp.asarray(taps)
    )


@functools.lru_cache(maxsize=None)
def _jitted_salience(capacity: str):
    """One compiled CREPE forward per capacity, shared across all
    extract_pitch_crepe calls (a per-call jit(lambda) never hits jit's
    function-identity cache and recompiles for every chunk)."""
    model = CREPE(capacity=capacity)

    @jax.jit
    def apply(variables, frames):
        return nn.sigmoid(model.apply(variables, frames))

    return apply


def crepe_salience(
    signal,
    sample_rate: int,
    block_size: int,
    params,
    capacity: str = "tiny",
    batch_frames: int = 512,
):
    """(T,) mono at `sample_rate` → ((F16, 360) salience, hop) at 16 kHz.

    F16 = 1 + len(resample(signal))//hop frames, center-padded, hop =
    16000·block_size/sample_rate samples — the frame grid the reference's
    CREPE call produces (core.py:104-108) before its np.interp back to the
    block grid."""
    signal = jnp.asarray(signal, jnp.float32)
    if signal.ndim != 1:
        raise ValueError(f"expects a mono (T,) signal, got {signal.shape}")

    x16 = resample_to_model_rate(signal, int(sample_rate))
    hop = max(1, int(MODEL_SRATE * block_size / sample_rate))
    pad = FRAME_LENGTH // 2
    padded = jnp.pad(x16, (pad, pad))
    n_frames = 1 + int(x16.shape[-1]) // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(FRAME_LENGTH)[None, :]
    frames = padded[idx]

    variables = {"params": params["params"]}
    if "batch_stats" in params:
        variables["batch_stats"] = params["batch_stats"]
    apply = _jitted_salience(capacity)

    # fixed (batch_frames, FRAME_LENGTH) chunks (last one padded): one
    # compile per capacity for the whole preprocessing run, not one retrace
    # per chunk row / per leftover size
    saliences = []
    for start in range(0, n_frames, batch_frames):
        chunk = frames[start : start + batch_frames]
        n_chunk = chunk.shape[0]
        if n_chunk < batch_frames:
            chunk = jnp.pad(chunk, ((0, batch_frames - n_chunk), (0, 0)))
        saliences.append(apply(variables, chunk)[:n_chunk])
    return jnp.concatenate(saliences, axis=0), hop


def _interp_to_block_grid(f0, hop, n_out, block_size, sample_rate):
    """16 kHz-hop track → block-grid track (the reference's np.interp,
    core.py:113-118)."""
    src_t = np.arange(f0.shape[0]) * hop / MODEL_SRATE
    dst_t = np.arange(n_out) * block_size / sample_rate
    return jnp.interp(jnp.asarray(dst_t, jnp.float32),
                      jnp.asarray(src_t, jnp.float32), f0)


def extract_pitch_crepe(
    signal,
    sample_rate: int,
    block_size: int,
    params,
    capacity: str = "tiny",
    viterbi: bool = True,
    batch_frames: int = 512,
    fmin: float | None = None,
    fmax: float | None = None,
):
    """Frame-rate f0 in Hz via the trained CREPE-architecture model.

    Same length contract as ops.pitch.extract_pitch and the reference
    (core.py:100-119): (T,) → (T // block_size,), with the model run at
    16 kHz on an integer hop and the track re-interpolated to the block
    grid — exactly the reference's np.interp step (core.py:113-118).

    `params` is the dict saved by scripts/train_crepe.py
    ({'params': ..., 'batch_stats': ...}).

    fmin/fmax (Hz, optional) restrict the decode to a pitch range by
    masking salience bins outside it — this is how
    preprocess.pitch_fmin/pitch_fmax reach the neural trackers
    (make_pitch_fn); None leaves the full 360-bin grid live.
    """
    n_out = int(jnp.shape(signal)[-1]) // int(block_size)
    salience, hop = crepe_salience(
        signal, sample_rate, block_size, params, capacity, batch_frames
    )
    if fmin is not None or fmax is not None:
        grid = cents_grid()
        lo = 1200.0 * math.log2(fmin / 10.0) if fmin is not None else -np.inf
        hi = 1200.0 * math.log2(fmax / 10.0) if fmax is not None else np.inf
        keep = jnp.asarray((grid >= lo) & (grid <= hi))
        salience = jnp.where(keep, salience, 0.0)
    cents = (
        viterbi_cents(salience) if viterbi else salience_to_cents(salience)
    )
    f0 = cents_to_hz(cents)
    return _interp_to_block_grid(f0, hop, n_out, block_size, sample_rate)


# ------------------------------------------------------- CREPE×YIN fusion


@functools.lru_cache(maxsize=None)
def _yin_to_crepe_grid(fmin: float, fmax: float, bins_per_octave: int):
    """Linear-interp gather (idx0, idx1, frac) from the YIN log grid onto
    the CREPE cents grid, clamped to the YIN grid's edges."""
    from ddsp_pytorch_tpu.ops.pitch import _pitch_grid

    yin_cents = 1200.0 * np.log2(_pitch_grid(fmin, fmax, bins_per_octave)
                                 / 10.0)
    pos = np.interp(cents_grid(), yin_cents, np.arange(yin_cents.shape[0]))
    idx0 = np.clip(np.floor(pos).astype(np.int32), 0, yin_cents.shape[0] - 2)
    frac = (pos - idx0).astype(np.float32)
    return jnp.asarray(idx0), jnp.asarray(frac)


def extract_pitch_hybrid(
    signal,
    sample_rate: int,
    block_size: int,
    params,
    capacity: str = "tiny",
    batch_frames: int = 512,
    yin_weight: float = 8.0,
    crepe_weight: float = 1.0,
    switch_per_octave: float = 60.0,
    salience_floor: float = 0.03,
    confidence_gate: float = 2.0,
    fmin: float = 32.0,
    fmax: float = 2100.0,
):
    """CREPE×YIN fused pitch: joint Viterbi over both evidence maps.

    The reference's parity path is neural (TF-CREPE, core.py:100-119); the
    classical YIN estimator is more robust in some degraded regimes
    (pretrained/pitch_robustness.json).  Their error modes are
    uncorrelated — CREPE misses come from out-of-distribution timbres,
    YIN misses from broadband noise filling the CMNDF dips — so fusing the
    evidence *before* decoding beats either alone: per 16 kHz-hop frame,

        cost(f) = crepe_weight · (−log S_crepe(f))
                + yin_weight   · d'_yin(f)            (CMNDF, 0 = periodic)

    on CREPE's 20-cent grid (YIN's 60-bins/octave grid is also 20 cents;
    the map is a fixed linear-interp gather), then one Viterbi pass with
    the same per-octave jump penalty as viterbi_cents, and CREPE's local
    weighted average around the decoded path using the combined
    pseudo-salience exp(−cost).  Same (T,) → (T//block_size,) length
    contract as extract_pitch / extract_pitch_crepe.

    Defaults were selected by sweeping cached evidence over the nine
    robustness conditions (scripts/tune_hybrid_pitch.py): ≥ YIN AND
    ≥ raw CREPE on 9/9 rows (pretrained/pitch_robustness.json).  The
    round-5 change is switch_per_octave 10 → 60: the dominant error mode
    was decayed note tails under broadband noise, where neither tracker
    has per-frame evidence and a weak transition penalty let the joint
    path jump to noise peaks; the strong penalty holds the last
    well-evidenced pitch (closing the one row the fusion lost to YIN,
    +10 dB pink: 0.888 → 0.944 vs YIN's 0.909) while note transitions
    and ±100-cent vibrato still track within 1 frame / ≤42 cents because
    genuine pitch motion carries per-frame evidence that dwarfs the
    one-time jump cost.
    """
    salience, d_16, hop = hybrid_evidence(
        signal, sample_rate, block_size, params, capacity, batch_frames,
        fmin=fmin, fmax=fmax,
    )
    # Exclude cents bins outside [fmin, fmax] from the DECODE too (same
    # semantics as YIN's candidate grid / the crepe salience mask): a YIN
    # grid narrower than CREPE's 360-bin range edge-clamps d' onto the
    # out-of-range bins — replicating a subharmonic dip into a flat
    # low-cost shelf (hybrid_evidence docstring) that the Viterbi could
    # otherwise park on when make_pitch_fn passes preprocess.pitch_fmin
    # (50 Hz default) instead of the full-grid 32–2100 defaults.
    grid = cents_grid()
    lo = 1200.0 * math.log2(fmin / 10.0)
    hi = 1200.0 * math.log2(fmax / 10.0)
    keep = jnp.asarray((grid >= lo) & (grid <= hi))
    n_out = int(jnp.shape(signal)[-1]) // int(block_size)
    f0 = decode_fused(salience, d_16, yin_weight=yin_weight,
                      crepe_weight=crepe_weight,
                      switch_per_octave=switch_per_octave,
                      salience_floor=salience_floor,
                      confidence_gate=confidence_gate,
                      keep=keep)
    return _interp_to_block_grid(f0, hop, n_out, block_size, sample_rate)


def hybrid_evidence(
    signal,
    sample_rate: int,
    block_size: int,
    params,
    capacity: str = "tiny",
    batch_frames: int = 512,
    fmin: float = 32.0,
    fmax: float = 2100.0,
):
    """Both evidence maps on CREPE's (frame, cents) grid:
    ((F16, 360) salience, (F16, 360) YIN CMNDF, hop).

    fmin/fmax default WIDER than extract_pitch's 50–2000 so the YIN grid
    covers CREPE's full 32.70–2093 Hz range: clamping out-of-range cents
    to the edge d' would replicate a subharmonic dip (e.g. the 50 Hz value
    for a 100 Hz note) across every lower bin — a flat low-cost shelf the
    Viterbi parks on under noise."""
    from ddsp_pytorch_tpu.ops.pitch import yin_emission

    signal = jnp.asarray(signal, jnp.float32)
    if signal.ndim != 1:
        raise ValueError(f"expects a mono (T,) signal, got {signal.shape}")

    salience, hop = crepe_salience(
        signal, sample_rate, block_size, params, capacity, batch_frames
    )
    n16 = salience.shape[0]

    # YIN evidence at the signal's own rate on the block hop...
    d = yin_emission(signal, int(sample_rate), int(block_size),
                     fmin=fmin, fmax=fmax)
    # ...onto the CREPE cents grid (frequency axis)...
    idx0, frac = _yin_to_crepe_grid(fmin, fmax, 60)
    d_c = d[:, idx0] * (1.0 - frac) + d[:, idx0 + 1] * frac  # (Fy, 360)
    # ...and onto the CREPE frame times (time axis).  YIN frame j sits at
    # j·block/sr seconds; CREPE frame i at i·hop/16000.
    pos = (np.arange(n16) * hop / MODEL_SRATE) * sample_rate / block_size
    # clamp to the YIN frame range BEFORE the floor/frac split: CREPE
    # frames past the last YIN frame must clamp to it, not linearly
    # extrapolate the CMNDF (tfrac > 1 off the end of the grid)
    pos = np.clip(pos, 0.0, d.shape[0] - 1)
    t0 = np.clip(np.floor(pos).astype(np.int32), 0, d.shape[0] - 2)
    tfrac = jnp.asarray((pos - t0).astype(np.float32))[:, None]
    t0 = jnp.asarray(t0)
    d_16 = d_c[t0] * (1.0 - tfrac) + d_c[t0 + 1] * tfrac  # (F16, 360)
    return salience, d_16, hop


def decode_fused(
    salience,
    d_16,
    yin_weight: float = 4.0,
    crepe_weight: float = 1.0,
    switch_per_octave: float = 3.0,
    salience_floor: float = 1e-6,
    confidence_gate: float = 0.0,
    keep=None,
):
    """Fused evidence → (F16,) f0 in Hz (Viterbi + local-average refine).

    keep: optional (360,) bool mask of decodable bins — bins outside it
    get an effectively infinite cost (and zero fused salience in the
    refine), restricting the track to a pitch range the way YIN's
    candidate grid does (extract_pitch_hybrid builds it from fmin/fmax).
    salience_floor: clip floor for −log S — caps how strongly CREPE can
    veto a bin it assigns ~zero salience (a higher floor hands broadband-
    noise frames to the YIN evidence).
    confidence_gate: scale each frame's CREPE cost by its peak salience
    raised to this power (0 = off), so frames where the net is unconfident
    defer to YIN; bool True is accepted as 1.0.

    (A per-frame YIN-confidence gate on the CREPE cost was evaluated in
    round 5 and measured to change NO decision on any robustness row —
    frames where YIN is confident already out-vote CREPE through the
    evidence sum — so it was not kept; the decisive lever for noisy note
    tails is the Viterbi switch penalty, see extract_pitch_hybrid.)
    """
    from ddsp_pytorch_tpu.ops.pitch import _viterbi

    crepe_cost = -jnp.log(jnp.clip(salience, salience_floor, 1.0))
    gate_pow = float(confidence_gate)
    if gate_pow > 0.0:
        conf = salience.max(axis=-1, keepdims=True)
        crepe_cost = crepe_cost * conf ** gate_pow
    cost = crepe_weight * crepe_cost + yin_weight * d_16
    if keep is not None:
        # 1e6 ≫ any reachable in-range path cost (≤ ~20/frame·switch);
        # exp(-(1e6 − min)) underflows to exactly 0 in the refine below.
        cost = jnp.where(keep, cost, jnp.float32(1e6))

    bins_per_octave = 1200.0 / CENTS_PER_BIN
    dist_oct = (
        np.abs(np.arange(N_BINS)[:, None] - np.arange(N_BINS)[None, :])
        / bins_per_octave
    )
    switch = jnp.asarray((switch_per_octave * dist_oct).astype(np.float32))
    path = _viterbi(cost, switch)

    fused_salience = jnp.exp(-(cost - cost.min(axis=-1, keepdims=True)))
    onehotish = jnp.where(
        jnp.abs(jnp.arange(N_BINS)[None, :] - path[:, None]) <= 4,
        fused_salience,
        0.0,
    )
    return cents_to_hz(salience_to_cents(onehotish))
