"""Uniform partitioned convolution (frequency-domain delay line).

Streaming equivalent of the reverb's causal FFT convolution
(ops/filters.py fft_convolve semantics): the length-L IR is split into
P = ⌈L/B⌉ block-sized partitions whose spectra form a frequency-domain
delay line; each incoming block contributes

    y_t = Σ_p  last-B-samples( irfft( IR_p ⊙ X_{t−p} ) ),
    X_t = rfft([x_{t−1}; x_t])          (overlap-save, 2B-point FFTs)

so streaming output equals the offline convolution exactly (tested).  This
is what the reference delegates to Pure Data's partconv~ external with the
exported impulse (README.md:99) — here it is on-device, differentiable-free
inference state, and part of the streaming synth itself.

State per stream: (X_hist (P, B+1) complex, prev_block (..., B) f32).
Per-block cost: 2 FFTs of 2B + P complex multiply-accumulates of B+1 bins.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class PartitionedIR(NamedTuple):
    spectra: jax.Array  # (P, B+1) complex64 — per-partition rfft(2B)
    block: int


class ConvState(NamedTuple):
    x_hist: jax.Array  # (..., P, B+1) complex64 — newest at index 0
    prev: jax.Array  # (..., B) previous input block


def partition_ir(ir: jax.Array, block: int) -> PartitionedIR:
    """Split a (L,) impulse response into 2B-point partition spectra."""
    l = ir.shape[-1]
    p = -(-l // block)
    ir_padded = jnp.pad(ir.astype(jnp.float32), (0, p * block - l))
    parts = ir_padded.reshape(p, block)
    # zero-pad each partition to 2B on the right: linear conv per partition
    parts = jnp.pad(parts, ((0, 0), (0, block)))
    return PartitionedIR(spectra=jnp.fft.rfft(parts, axis=-1), block=block)


def init_state(pir: PartitionedIR, batch_shape: Tuple[int, ...] = ()) -> ConvState:
    p, bins = pir.spectra.shape
    return ConvState(
        x_hist=jnp.zeros(batch_shape + (p, bins), jnp.complex64),
        prev=jnp.zeros(batch_shape + (pir.block,), jnp.float32),
    )


def streaming_convolve(
    pir: PartitionedIR, state: ConvState, x: jax.Array
):
    """Convolve n = k·B samples: (..., n) → (..., n), carrying state.

    Equivalent to the causal linear convolution y[t] = Σ_{τ≤t} ir[τ]·x[t−τ]
    continued across calls.

    All k blocks of the chunk are processed at once (batched FFTs + one
    windowed complex reduction over the partition axis) — no sequential
    scan, so per-call device work is a handful of fused ops regardless of k
    (a lax.scan here is dispatch-bound: P tiny MACs per step).
    """
    import numpy as np

    b = pir.block
    n = x.shape[-1]
    assert n % b == 0, f"chunk {n} must be a multiple of partition block {b}"
    k = n // b
    p = pir.spectra.shape[0]
    batch_shape = x.shape[:-1]
    blocks = x.reshape(batch_shape + (k, b))  # (..., k, B)

    # 2B overlap-save buffers per block: [x_{t-1}; x_t]
    prev_blocks = jnp.concatenate(
        [state.prev[..., None, :], blocks[..., :-1, :]], axis=-2
    )
    bufs = jnp.concatenate([prev_blocks, blocks], axis=-1)  # (..., k, 2B)
    x_spec = jnp.fft.rfft(bufs, axis=-1)  # (..., k, B+1)

    # Time-ordered spectra: P-1 newest history entries (oldest first), then
    # this chunk.  state.x_hist is newest-first.
    hist_old_first = state.x_hist[..., ::-1, :]  # (..., P, bins) oldest first
    x_all = jnp.concatenate(
        [hist_old_first[..., 1:, :], x_spec], axis=-2
    )  # (..., P-1+k, bins)

    # X_{t-p} = x_all[P-1 + t - p]  for t in [0,k), p in [0,P)
    idx = (p - 1) + np.arange(k)[:, None] - np.arange(p)[None, :]  # (k, P)
    windows = x_all[..., idx, :]  # (..., k, P, bins)
    y_spec = jnp.sum(pir.spectra * windows, axis=-2)  # (..., k, bins)
    y = jnp.fft.irfft(y_spec, 2 * b, axis=-1)[..., b:]  # (..., k, B)

    new_hist = x_all[..., ::-1, :][..., :p, :]  # newest-first last P spectra
    new_state = ConvState(x_hist=new_hist, prev=blocks[..., -1, :])
    return y.reshape(batch_shape + (n,)), new_state
