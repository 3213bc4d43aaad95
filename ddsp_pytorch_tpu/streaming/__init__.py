"""L6a — stateful block-streaming inference.

The reference's realtime path is a TorchScript module holding a GRU cache
buffer, driven block-by-block from C++ (ddsp_tilde.cpp) — and its Python
half is broken (realtime_forward references renamed attributes, SURVEY.md
§2.8.2), and carries *no oscillator phase*, so each block restarts the
harmonic phase (an audible discontinuity the double-buffer masks).

Here streaming is exact: a StreamState pytree carries the GRU hidden state,
the oscillator phase, and the PRNG key; one jitted step function with donated
buffers renders each block.  tests/test_streaming.py proves block-streamed
output ≡ offline output (the invariant the reference never checks —
SURVEY.md §4 item 5).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np


@flax.struct.dataclass
class StreamState:
    gru: jax.Array  # (B, hidden)
    phase: jax.Array  # (B,)
    rng: jax.Array  # PRNG key for the noise synth


def init_stream_state(hidden_size: int, batch: int = 1, seed: int = 0) -> StreamState:
    return StreamState(
        gru=jnp.zeros((batch, hidden_size), jnp.float32),
        phase=jnp.zeros((batch,), jnp.float32),
        rng=jax.random.PRNGKey(seed),
    )


class StreamingSynth:
    """Block-streaming DDSP synthesizer around a trained DDSPDecoder.

    `step(f0_frames, loudness_frames)` consumes frame-rate controls
    (B, F_block, 1) and returns (B, F_block * block_size) audio;
    `step_samples(pitch, loudness)` consumes *sample-rate* control signals
    (the realtime wire format of the reference's Pd external,
    ddsp_model.cpp:32-52) and decimates by block_size like the reference
    export wrapper (export.py:36-37).

    Loudness normalization stats are baked in (export.py:29-30 parity).
    No reverb, matching the reference's realtime contract — the exported
    impulse is applied externally.
    """

    def __init__(
        self,
        model,
        params,
        mean_loudness: float = 0.0,
        std_loudness: float = 1.0,
        batch: int = 1,
        seed: int = 0,
        noise_deterministic: bool = False,
    ):
        self.model = model
        self.params = params
        self.block_size = int(model.block_size)
        self.sample_rate = int(model.sample_rate)
        self.mean_loudness = float(mean_loudness)
        self.std_loudness = float(std_loudness)
        self.state = init_stream_state(model.hidden_size, batch, seed)
        self._noise_deterministic = noise_deterministic

        def step_fn(params, state: StreamState, f0, loudness):
            loudness = (loudness - self.mean_loudness) / self.std_loudness
            rng, noise_rng = jax.random.split(state.rng)
            b, f = f0.shape[0], f0.shape[1]
            if noise_deterministic:
                noise = jnp.zeros((b, f, self.block_size), jnp.float32)
            else:
                noise = (
                    jax.random.uniform(noise_rng, (b, f, self.block_size)) * 2.0
                    - 1.0
                )
            audio, gru, phase = model.apply(
                {"params": params},
                f0,
                loudness,
                state.gru,
                state.phase,
                noise,
                method=model.streaming_step,
            )
            return audio, StreamState(gru=gru, phase=phase, rng=rng)

        self._step = jax.jit(step_fn, donate_argnums=(1,))

    def reset(self, seed: int = 0) -> None:
        b = self.state.gru.shape[0]
        self.state = init_stream_state(self.model.hidden_size, b, seed)

    def step(self, f0_frames, loudness_frames) -> np.ndarray:
        """Frame-rate controls (B, F, 1) → (B, F*block_size) audio."""
        audio, self.state = self._step(
            self.params,
            self.state,
            jnp.asarray(f0_frames, jnp.float32),
            jnp.asarray(loudness_frames, jnp.float32),
        )
        return audio

    def step_samples(self, pitch, loudness):
        """Sample-rate controls (B, n) → (B, n) audio; n % block_size == 0.

        Stride-decimates controls to frame rate (export.py:36-37 parity).
        Returns a *device* array — callers that need host audio convert with
        np.asarray (one D2H copy); keeping it on device lets callers chain
        synthesis without paying transfer latency per block.
        """
        pitch = np.asarray(pitch, np.float32)
        loudness = np.asarray(loudness, np.float32)
        f0 = pitch[:, :: self.block_size, None]
        loud = loudness[:, :: self.block_size, None]
        return self.step(f0, loud)
