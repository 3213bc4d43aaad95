"""Monophonic pitch tracking — JAX YIN + Viterbi smoothing.

Role parity: reference ddsp/core.py:100-119 (`extract_pitch`) shells out to
the CREPE neural tracker (TensorFlow) with ``viterbi=True`` and a step size of
one block.  This framework cannot (and should not) embed a TF model, so pitch
is extracted with a classical estimator of comparable quality for monophonic
instrument audio: the YIN cumulative-mean-normalized difference function
(de Cheveigné & Kawahara 2002) evaluated on a log-spaced pitch grid, smoothed
with a Viterbi pass penalizing large pitch jumps — the same smoothing idea
CREPE's ``viterbi=True`` applies to its salience map.

Everything is vectorized over frames (one FFT-based autocorrelation batch +
one lax.scan for the Viterbi recursion), so it jits and runs on TPU or CPU.
The second ingestion path of the reference (sigmund~-preprocessed wavs,
preprocess_from_sigmund.py) is implemented in data/sigmund.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def _next_pow2(n: int) -> int:
    return 1 << (n - 1).bit_length()


def _frame_centered(signal: jnp.ndarray, frame_length: int, hop: int):
    """Center-padded framing: frame i covers [i*hop - L/2, i*hop + L/2)."""
    t = signal.shape[-1]
    pad = frame_length // 2
    padded = jnp.pad(signal, [(0, 0)] * (signal.ndim - 1) + [(pad, pad)], "reflect")
    n_frames = 1 + t // hop
    idx = np.arange(n_frames)[:, None] * hop + np.arange(frame_length)[None, :]
    return padded[..., idx]


def cmndf(frames: jnp.ndarray, window: int, tau_max: int) -> jnp.ndarray:
    """Cumulative-mean-normalized difference function per frame.

    Args:
      frames: (F, L) with L >= window + tau_max.
      window: YIN integration window W.
      tau_max: largest lag evaluated (exclusive upper bound is tau_max+1).
    Returns:
      (F, tau_max + 1) normalized difference d'(τ), with d'(0) = 1.
    """
    frames = frames.astype(jnp.float32)
    head = frames[..., :window]

    # C(τ) = Σ_{j<W} x_j · x_{j+τ} via FFT cross-correlation.
    n_fft = _next_pow2(frames.shape[-1] + window)
    spec_full = jnp.fft.rfft(frames, n_fft)
    spec_head = jnp.fft.rfft(head, n_fft)
    corr = jnp.fft.irfft(spec_full * jnp.conj(spec_head), n_fft)
    corr = corr[..., : tau_max + 1]

    # Energy terms: E0 = Σ_{j<W} x_j²;  E(τ) = Σ_{j=τ}^{τ+W-1} x_j².
    sq = jnp.square(frames)
    csum = jnp.cumsum(sq, axis=-1)
    zero = jnp.zeros(csum.shape[:-1] + (1,), csum.dtype)
    csum = jnp.concatenate([zero, csum], axis=-1)  # exclusive prefix
    taus = jnp.arange(tau_max + 1)
    energy_tau = csum[..., taus + window] - csum[..., taus]
    energy0 = energy_tau[..., :1]

    diff = energy0 + energy_tau - 2.0 * corr  # d(τ)
    diff = jnp.maximum(diff, 0.0)

    # Cumulative-mean normalization: d'(τ) = d(τ)·τ / Σ_{j≤τ} d(j), d'(0)=1.
    cum = jnp.cumsum(diff[..., 1:], axis=-1)
    norm = diff[..., 1:] * taus[1:] / jnp.maximum(cum, 1e-12)
    return jnp.concatenate([jnp.ones_like(diff[..., :1]), norm], axis=-1)


@functools.lru_cache(maxsize=None)
def _pitch_grid(fmin: float, fmax: float, bins_per_octave: int) -> np.ndarray:
    n_bins = int(math.ceil(bins_per_octave * math.log2(fmax / fmin))) + 1
    return fmin * 2.0 ** (np.arange(n_bins) / bins_per_octave)


def _viterbi(emission: jnp.ndarray, switch_penalty: jnp.ndarray) -> jnp.ndarray:
    """Min-sum Viterbi over (F, n_bins) emission costs.

    switch_penalty: (n_bins, n_bins) transition cost matrix.
    Returns the (F,) int32 best path.
    """

    def forward(cost_prev, emis_t):
        # min-plus 'matmul': best predecessor per bin.
        total = cost_prev[:, None] + switch_penalty  # (bins_prev, bins)
        best_prev = jnp.argmin(total, axis=0)
        cost = jnp.min(total, axis=0) + emis_t
        return cost, best_prev

    cost0 = emission[0]
    costs, back = jax.lax.scan(forward, cost0, emission[1:])
    last = jnp.argmin(costs, axis=0) if emission.shape[0] > 1 else jnp.argmin(cost0)

    def backward(state, back_t):
        state = back_t[state]
        return state, state

    _, path_rev = jax.lax.scan(backward, last, back[::-1])
    path = jnp.concatenate([path_rev[::-1], last[None]])
    return path


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "block_size", "fmin", "fmax",
                              "frame_length", "bins_per_octave")
)
def yin_emission(
    signal,
    sample_rate: int,
    block_size: int,
    fmin: float = 50.0,
    fmax: float = 2000.0,
    frame_length: int = 2048,
    bins_per_octave: int = 60,
):
    """Per-frame YIN emission costs over the log pitch grid.

    (T,) → (1 + T//block_size, n_bins) CMNDF values d'(f) evaluated on the
    log-spaced grid (``ops.pitch._pitch_grid(fmin, fmax, bins_per_octave)``),
    subharmonic-penalized — the matrix ``_track`` Viterbi-decodes, exposed
    so fusion trackers (models/crepe.py:extract_pitch_hybrid) can combine
    YIN evidence with a neural salience map before decoding."""
    tau_max = int(math.ceil(sample_rate / fmin))
    window = frame_length
    frames = _frame_centered(signal, window + tau_max, block_size)
    d = cmndf(frames, window, tau_max)  # (F, tau_max+1)

    # Evaluate d' on the log pitch grid by *quadratic* interpolation in lag:
    # CMNDF dips at high frequencies are narrower than one lag sample, and
    # linear interpolation systematically over-reads them (making the wider
    # subharmonic dip at 2τ look deeper — an octave-error trap).
    grid = _pitch_grid(fmin, fmax, bins_per_octave)
    taus = sample_rate / grid  # (n_bins,) fractional lags, descending
    k = np.clip(np.round(taus).astype(np.int32), 1, tau_max - 1)
    delta = jnp.asarray((taus - k).astype(np.float32))  # ∈ [-0.5, 0.5]
    k = jnp.asarray(k)
    dm, d0, dp = d[..., k - 1], d[..., k], d[..., k + 1]
    emis = (
        d0
        + 0.5 * delta * (dp - dm)
        + 0.5 * jnp.square(delta) * (dp - 2.0 * d0 + dm)
    )  # (F, n_bins)
    emis = jnp.maximum(emis, 0.0)

    # Subharmonic (octave-down) suppression: every integer multiple of the
    # true period also nulls the difference function, so d'(2τ) ≈ d'(τ) ≈ 0
    # for clean tones.  Classic YIN resolves this by taking the *smallest*
    # lag under threshold (de Cheveigné §2 step 4); on a grid search the
    # equivalent is a small per-octave lag penalty — large enough to split
    # numerically-tied dips, far too small to override a real CMNDF contrast.
    octaves_above_min_lag = np.log2(taus / taus.min())
    emis = emis + jnp.asarray((0.02 * octaves_above_min_lag).astype(np.float32))
    return emis


@functools.partial(
    jax.jit, static_argnames=("sample_rate", "block_size", "fmin", "fmax",
                              "frame_length", "bins_per_octave")
)
def _track(
    signal,
    sample_rate: int,
    block_size: int,
    fmin: float,
    fmax: float,
    frame_length: int,
    bins_per_octave: int,
):
    grid = _pitch_grid(fmin, fmax, bins_per_octave)
    emis = yin_emission(signal, sample_rate, block_size, fmin, fmax,
                        frame_length, bins_per_octave)

    # Viterbi: quadratic-in-distance jump penalty, in octaves.
    n_bins = grid.shape[0]
    dist_oct = np.abs(np.arange(n_bins)[:, None] - np.arange(n_bins)[None, :]) / (
        bins_per_octave
    )
    # ~0.6 cost per octave jump between adjacent frames; CMNDF dips are O(0.1)
    # deep, so this forbids octave errors unless strongly supported.
    switch = jnp.asarray((0.6 * dist_oct).astype(np.float32))
    path = _viterbi(emis, switch)

    # Parabolic refinement over log2(f) using neighboring-bin costs.
    pm = jnp.clip(path - 1, 0, n_bins - 1)
    pp = jnp.clip(path + 1, 0, n_bins - 1)
    fidx = jnp.arange(emis.shape[0])
    em, e0, ep = emis[fidx, pm], emis[fidx, path], emis[fidx, pp]
    denom = em - 2.0 * e0 + ep
    # refine only where the path bin is a local minimum (positive
    # curvature); when the Viterbi switch penalty holds the path off the
    # emission minimum, denom ≤ 0 and the parabola has no interior vertex
    delta = jnp.where(
        denom > 1e-12, 0.5 * (em - ep) / jnp.maximum(denom, 1e-12), 0.0
    )
    delta = jnp.clip(delta, -0.5, 0.5)
    # no refinement at grid edges (clipped neighbors repeat the same bin)
    delta = jnp.where((path == 0) | (path == n_bins - 1), 0.0, delta)
    log2_f = jnp.log2(jnp.asarray(grid.astype(np.float32)))[path] + delta / (
        bins_per_octave
    )
    return 2.0 ** log2_f


def extract_pitch(
    signal,
    sample_rate: int,
    block_size: int,
    fmin: float = 50.0,
    fmax: float = 2000.0,
    frame_length: int = 2048,
    bins_per_octave: int = 60,
):
    """Frame-rate f0 in Hz for a mono signal.

    (T,) → (T // block_size,): one frame per block; the final (center-padded)
    frame is dropped, matching the reference's length contract
    (core.py:100-119 drops the last CREPE frame and re-interpolates to
    len(signal)//block_size).
    """
    signal = jnp.asarray(signal, jnp.float32)
    if signal.ndim != 1:
        raise ValueError(
            f"extract_pitch expects a mono (T,) signal, got {signal.shape}; "
            "vmap/loop over batch items (data/preprocess.py does)"
        )
    f0 = _track(
        signal,
        int(sample_rate),
        int(block_size),
        float(fmin),
        float(fmax),
        int(frame_length),
        int(bins_per_octave),
    )
    return f0[: signal.shape[-1] // block_size]
