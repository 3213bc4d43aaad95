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


def _step_block(pir: PartitionedIR, state: ConvState, x: jax.Array):
    """One B-sample block: (..., B) → (..., B) output + new state."""
    b = pir.block
    buf = jnp.concatenate([state.prev, x], axis=-1)  # (..., 2B)
    x_spec = jnp.fft.rfft(buf, axis=-1)  # (..., B+1)
    x_hist = jnp.concatenate(
        [x_spec[..., None, :], state.x_hist[..., :-1, :]], axis=-2
    )
    acc = jnp.sum(pir.spectra * x_hist, axis=-2)  # (..., B+1)
    y = jnp.fft.irfft(acc, 2 * b, axis=-1)[..., b:]  # overlap-save keep
    return y, ConvState(x_hist=x_hist, prev=x)


def streaming_convolve(
    pir: PartitionedIR, state: ConvState, x: jax.Array
):
    """Convolve n = k·B samples: (..., n) → (..., n), carrying state.

    Equivalent to the causal linear convolution y[t] = Σ_{τ≤t} ir[τ]·x[t−τ]
    continued across calls.
    """
    b = pir.block
    n = x.shape[-1]
    assert n % b == 0, f"chunk {n} must be a multiple of partition block {b}"
    k = n // b
    batch_shape = x.shape[:-1]
    blocks = jnp.moveaxis(x.reshape(batch_shape + (k, b)), -2, 0)  # (k, ..., B)

    def scan_fn(st, xb):
        y, st = _step_block(pir, st, xb)
        return st, y

    state, ys = jax.lax.scan(scan_fn, state, blocks)
    y = jnp.moveaxis(ys, 0, -2).reshape(batch_shape + (n,))
    return y, state
