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

from typing import Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np

from ddsp_pytorch_tpu.streaming.mfcc import StreamingMFCC  # noqa: F401


@flax.struct.dataclass
class StreamState:
    gru: jax.Array  # (B, hidden) decoder GRU carry
    phase: jax.Array  # (B,)
    rng: jax.Array  # PRNG key for the noise synth
    reverb: Optional[object] = None  # partitioned-conv ConvState, if enabled
    enc_gru: Optional[jax.Array] = None  # (B, hidden) encoder GRU carry
    # (mfcc-autoencoder streams only)


def init_stream_state(
    hidden_size: int,
    batch: int = 1,
    seed: int = 0,
    reverb_state=None,
    enc_hidden_size: Optional[int] = None,
) -> StreamState:
    return StreamState(
        gru=jnp.zeros((batch, hidden_size), jnp.float32),
        phase=jnp.zeros((batch,), jnp.float32),
        rng=jax.random.PRNGKey(seed),
        reverb=reverb_state,
        enc_gru=(
            jnp.zeros((batch, enc_hidden_size), jnp.float32)
            if enc_hidden_size is not None
            else None
        ),
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
    Reverb: off by default (the reference's realtime contract applies the
    exported impulse externally); include_reverb=True renders the trained
    reverb *in-stream* via partitioned convolution (ops/partitioned_conv.py)
    with the 1 s IR's frequency-domain delay line carried in the state —
    a capability the reference delegates to Pd's partconv~.
    """

    needs_audio = False  # AutoencoderStreamSession overrides

    def __init__(
        self,
        model,
        params,
        mean_loudness: float = 0.0,
        std_loudness: float = 1.0,
        batch: int = 1,
        seed: int = 0,
        noise_deterministic: bool = False,  # zero noise draw: harmonic-only
        # output (used by equivalence tests and latency benchmarks where the
        # stochastic branch would mask comparisons)
        include_reverb: bool = False,
    ):
        self.model = model
        self.params = params
        self.block_size = int(model.block_size)
        self.sample_rate = int(model.sample_rate)
        self.mean_loudness = float(mean_loudness)
        self.std_loudness = float(std_loudness)
        self._noise_deterministic = noise_deterministic
        self._batch = batch
        from ddsp_pytorch_tpu.models.encoder import DDSPAutoencoder

        # mfcc-autoencoder streams additionally thread the encoder GRU carry
        # and take per-block MFCC frames (from streaming/mfcc.py StreamingMFCC)
        # — the reference's autoencoder has no realtime path at all.
        self._autoencoder = isinstance(model, DDSPAutoencoder)

        self._pir = None
        if include_reverb:
            if "reverb" not in params:
                raise ValueError("include_reverb=True but model has no reverb")
            from ddsp_pytorch_tpu.models.modules import Reverb
            from ddsp_pytorch_tpu.ops import partitioned_conv as pconv

            reverb = Reverb(self.sample_rate, self.sample_rate)
            ir = reverb.apply(
                {"params": params["reverb"]}, method=reverb.build_impulse
            )
            self._pir = pconv.partition_ir(ir, self.block_size)

        self.state = self._fresh_state(batch, seed)

        # NOTE: the reverb spectra are passed as an *argument*, not closed
        # over — a closure constant would be embedded into the executable,
        # which forces a device→host pull of the complex64 array at trace
        # time (unimplemented on some TPU transports).
        def step_fn(params, state: StreamState, f0, loudness, ir_spectra,
                    active=None, mfcc=None):
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
            if self._autoencoder:
                audio, enc_gru, gru, phase = model.apply(
                    {"params": params},
                    f0,
                    loudness,
                    mfcc,
                    state.enc_gru,
                    state.gru,
                    state.phase,
                    noise,
                    method=model.streaming_step,
                )
            else:
                audio, gru, phase = model.apply(
                    {"params": params},
                    f0,
                    loudness,
                    state.gru,
                    state.phase,
                    noise,
                    method=model.streaming_step,
                )
                enc_gru = state.enc_gru
            reverb_state = state.reverb
            if ir_spectra is not None:
                from ddsp_pytorch_tpu.ops import partitioned_conv as pconv

                pir = pconv.PartitionedIR(
                    spectra=ir_spectra, block=self.block_size
                )
                audio, reverb_state = pconv.streaming_convolve(
                    pir, reverb_state, audio
                )
            if active is not None:
                # masked advance (VoicePool): rows with active=False keep
                # their stream state — their output rows are meaningless.
                # The shared PRNG key always advances; it is a batch-level
                # resource, not per-voice state.
                def keep(new, old):
                    m = active.reshape(
                        active.shape + (1,) * (new.ndim - active.ndim)
                    )
                    return jnp.where(m, new, old)

                gru = keep(gru, state.gru)
                phase = keep(phase, state.phase)
                if enc_gru is not None:
                    enc_gru = keep(enc_gru, state.enc_gru)
                if reverb_state is not None:
                    reverb_state = jax.tree.map(
                        keep, reverb_state, state.reverb
                    )
            return audio, StreamState(
                gru=gru, phase=phase, rng=rng, reverb=reverb_state,
                enc_gru=enc_gru,
            )

        self._step_raw = jax.jit(step_fn, donate_argnums=(1,))

        def _step(params, state, f0, loudness, active=None, mfcc=None):
            if self._autoencoder and mfcc is None:
                raise ValueError(
                    "mfcc-autoencoder stream: pass mfcc frames (B, F, "
                    "n_mfccs) — see streaming/mfcc.py StreamingMFCC"
                )
            spectra = self._pir.spectra if self._pir is not None else None
            return self._step_raw(params, state, f0, loudness, spectra,
                                  active, mfcc)

        self._step = _step

    def _fresh_state(self, batch: int, seed: int) -> StreamState:
        reverb_state = None
        if self._pir is not None:
            from ddsp_pytorch_tpu.ops import partitioned_conv as pconv

            reverb_state = pconv.init_state(self._pir, (batch,))
        return init_stream_state(
            self.model.hidden_size,
            batch,
            seed,
            reverb_state,
            enc_hidden_size=(
                self.model.hidden_size if self._autoencoder else None
            ),
        )

    def reset(self, seed: int = 0) -> None:
        self.state = self._fresh_state(self._batch, seed)

    def fresh_state(self, seed: int = 0) -> StreamState:
        """A new independent stream state (for multi-session hosts that
        share this instance's compiled step — e.g. serve.py)."""
        return self._fresh_state(self._batch, seed)

    def step_stateless(self, state: StreamState, f0_frames, loudness_frames,
                       mfcc_frames=None):
        """Pure step: (state, controls) → (audio, new_state).  Shares the
        compiled function across arbitrarily many concurrent sessions.
        mfcc_frames (B, F, n_mfccs): required for mfcc-autoencoder streams."""
        return self._step(
            self.params,
            state,
            self._as_f32(f0_frames),
            self._as_f32(loudness_frames),
            mfcc=self._as_mfcc(mfcc_frames),
        )

    def step_stateless_masked(self, state: StreamState, f0_frames,
                              loudness_frames, active, mfcc_frames=None):
        """Pure step advancing only the voices with active=True: inactive
        rows keep their stream state and their output rows are meaningless.
        This is the VoicePool primitive — one batched dispatch serves every
        active session in lockstep."""
        return self._step(
            self.params,
            state,
            self._as_f32(f0_frames),
            self._as_f32(loudness_frames),
            jnp.asarray(active, bool),
            mfcc=self._as_mfcc(mfcc_frames),
        )

    @staticmethod
    def _as_f32(x):
        # Identity on device f32 arrays: through a remote-TPU transport even
        # a no-op jnp.asarray costs a dispatch (~80 us measured) — more than
        # the whole synth step, so the hot path must not pay it per input.
        # Weak-typed arrays (e.g. jnp.full with a Python float) still take
        # the asarray path: passing them through would change the jit cache
        # key and silently retrace the step.
        if (
            isinstance(x, jax.Array)
            and x.dtype == jnp.float32
            and not getattr(x.aval, "weak_type", False)
        ):
            return x
        return jnp.asarray(x, jnp.float32)

    @classmethod
    def _as_mfcc(cls, mfcc_frames):
        return cls._as_f32(mfcc_frames) if mfcc_frames is not None else None

    def step(self, f0_frames, loudness_frames, mfcc_frames=None) -> np.ndarray:
        """Frame-rate controls (B, F, 1) → (B, F*block_size) audio."""
        audio, self.state = self._step(
            self.params,
            self.state,
            self._as_f32(f0_frames),
            self._as_f32(loudness_frames),
            mfcc=self._as_mfcc(mfcc_frames),
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


class AutoencoderStreamSession:
    """Sample-rate streaming session for mfcc-autoencoder bundles.

    Wraps a (shared) StreamingSynth + a per-session causal MFCC extractor
    behind the same sample-rate wire contract the decoder's `step_samples`
    has, with exactly ONE block of output latency: MFCC frame 0's reflect
    pad needs one sample beyond block 0 (streaming/mfcc.py StreamingMFCC), so
    the out-FIFO is primed with a silent block and every response is the
    previous block's render.  Still half the reference's own two-block
    double-buffer latency (ddsp_tilde.cpp:7,87) — and the reference cannot
    stream its autoencoder at all (encoder.py:29-141 has no realtime path).

    Used by serve.py autoencoder sessions and the C++ host
    (ddsp_model_perform_audio).  Not thread-safe; callers serialize.

    `step_fn` pluggability: the FIFO/latency machinery here is the single
    home of the one-block-alignment invariants, while the actual render is
    a callback `(f0 (r,1), loudness (r,1), mfcc (r,n_mfcc)) -> (r*block,)
    host audio`.  The default owns a private StreamState and dispatches
    `synth.step_stateless`; serve.py substitutes a lock-scoped dispatch
    (voices=1) or a VoicePool-backed batched dispatch (voices>1) without
    duplicating the FIFOs.
    """

    needs_audio = True

    def __init__(self, synth: StreamingSynth, extractor, seed: int = 0,
                 step_fn=None):
        self.synth = synth
        self.block_size = synth.block_size
        self.sample_rate = synth.sample_rate
        self._sm = extractor
        if step_fn is None:
            self.state = synth.fresh_state(seed=seed)
            step_fn = self._default_step
        self._step_fn = step_fn
        self._frames = np.zeros((0, extractor.n_mfcc), np.float32)
        self._ctrl = np.zeros((0, 2), np.float32)  # (f0, loudness) frames
        self._out = np.zeros(self.block_size, np.float32)

    def _default_step(self, f0, loud, mfcc) -> np.ndarray:
        audio_dev, self.state = self.synth.step_stateless(
            self.state, f0[None], loud[None], mfcc_frames=mfcc[None]
        )
        return np.asarray(audio_dev)[0]

    def step_samples(self, pitch, loudness, audio) -> np.ndarray:
        """(n,) sample-rate pitch/loudness/input-audio → (n,) output audio
        (delayed one block); n must be a multiple of block_size."""
        pitch = np.asarray(pitch, np.float32).reshape(-1)
        loudness = np.asarray(loudness, np.float32).reshape(-1)
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = len(pitch)
        if n % self.block_size or len(loudness) != n or len(audio) != n:
            raise ValueError(
                f"need equal-length inputs, n % block_size({self.block_size})"
                " == 0"
            )
        frames = self._sm.push(audio[None])[0]
        self._frames = np.concatenate([self._frames, frames])
        self._ctrl = np.concatenate(
            [
                self._ctrl,
                np.stack(
                    [pitch[:: self.block_size], loudness[:: self.block_size]],
                    axis=1,
                ),
            ]
        )
        r = min(len(self._frames), len(self._ctrl))
        if r:
            audio = self._step_fn(
                self._ctrl[:r, :1], self._ctrl[:r, 1:], self._frames[:r]
            )
            self._frames = self._frames[r:]
            self._ctrl = self._ctrl[r:]
            self._out = np.concatenate(
                [self._out, np.asarray(audio, np.float32).reshape(-1)]
            )
        out, self._out = self._out[:n], self._out[n:]
        return out
