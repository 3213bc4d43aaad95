"""VoicePool — slot-based batched streaming for multi-session serving.

The reference serves exactly one stream per process (the Pd external holds
one model and one cache, realtime/ddsp_tilde/ddsp_tilde.cpp) — N sessions
cost N processes.  On TPU the economics invert: the BASELINE.md batch sweep
shows batch-32 synthesis costs ~3x batch-1 wall-clock for 32x the voices,
because one v5e chip is massively underutilized by a single voice.  The
TPU-native serving design is therefore ONE compiled step at batch = V with
every concurrent session owning a row ("slot") of the batched StreamState:

  * each dispatch advances every *active* slot in lockstep
    (StreamingSynth.step_stateless_masked); inactive slots keep their
    state bit-exactly — per-voice isolation is tested against independent
    batch-1 streams;
  * acquire()/release() manage slots; release zero-resets the slot's GRU
    carry, oscillator phase and reverb delay line on device (no
    reallocation, no recompilation);
  * the batch-level PRNG key advances on every dispatch — noise draws are
    a pool resource, not per-voice state (documented semantics).

serve.py builds its multi-voice mode on this: a dispatcher thread batches
the sessions' pending requests into single device dispatches.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ddsp_pytorch_tpu.streaming import StreamingSynth, StreamState


def _reset_slot(state: StreamState, slot) -> StreamState:
    """Zero one voice's carries (GRUs, phase, reverb line); rng untouched."""
    new = StreamState(
        gru=state.gru.at[slot].set(0.0),
        phase=state.phase.at[slot].set(0.0),
        rng=state.rng,
        reverb=(
            None
            if state.reverb is None
            else jax.tree.map(
                lambda x: x.at[slot].set(0), state.reverb
            )
        ),
        enc_gru=(
            None
            if state.enc_gru is None
            else state.enc_gru.at[slot].set(0.0)
        ),
    )
    return new


class VoicePool:
    """Up to `voices` concurrent streams through one compiled batched step.

    Thread-safe: acquire/release/step serialize on an internal lock (the
    device dispatch itself is single-stream anyway).
    """

    def __init__(self, synth: StreamingSynth):
        self.synth = synth
        self.voices = int(synth.state.gru.shape[0])
        self.block_size = synth.block_size
        self.sample_rate = synth.sample_rate
        self._state = synth.fresh_state()
        self._free = list(range(self.voices - 1, -1, -1))
        self._lock = threading.Lock()
        self._reset = jax.jit(_reset_slot, donate_argnums=(0,))

    # ------------------------------------------------------------- slots
    def acquire(self) -> Optional[int]:
        """Claim a fresh-state slot; None when the pool is full."""
        with self._lock:
            if not self._free:
                return None
            slot = self._free.pop()
            self._state = self._reset(self._state, slot)
            return slot

    def release(self, slot: int) -> None:
        with self._lock:
            if slot in self._free:
                return
            self._state = self._reset(self._state, slot)
            self._free.append(slot)

    @property
    def active_count(self) -> int:
        with self._lock:
            return self.voices - len(self._free)

    # ------------------------------------------------------------- step
    def step(
        self, requests: Dict[int, Tuple[np.ndarray, ...]]
    ) -> Dict[int, np.ndarray]:
        """One batched dispatch serving every requesting slot.

        requests: slot → (f0_frames (F, 1), loudness_frames (F, 1)) — plus
        mfcc_frames (F, n_mfccs) as a third element for mfcc-autoencoder
        pools; all requests in one call must share F.  Returns slot →
        (F*block,) host audio.  Slots without a request keep their state.

        The active rows come back in ONE device gather + ONE host pull —
        per-slot row extraction would cost a dispatch (and a tunnel
        round-trip) per voice, which is exactly what batching exists to
        amortize.
        """
        if not requests:
            return {}
        autoencoder = getattr(self.synth, "_autoencoder", False)
        frames = {np.asarray(r[0]).shape[0] for r in requests.values()}
        if len(frames) != 1:
            raise ValueError(
                f"all requests in one dispatch must share a frame count, "
                f"got {sorted(frames)}"
            )
        (f,) = frames
        v = self.voices
        f0 = np.zeros((v, f, 1), np.float32)
        loud = np.zeros((v, f, 1), np.float32)
        mfcc = None
        active = np.zeros((v,), bool)
        order = sorted(requests)
        for slot, req in requests.items():
            if autoencoder and len(req) != 3:
                raise ValueError(
                    "mfcc-autoencoder pool: requests are "
                    "(f0, loudness, mfcc_frames)"
                )
            f0[slot] = np.asarray(req[0], np.float32).reshape(f, 1)
            loud[slot] = np.asarray(req[1], np.float32).reshape(f, 1)
            if autoencoder:
                mf = np.asarray(req[2], np.float32)
                if mfcc is None:
                    mfcc = np.zeros((v, f, mf.shape[-1]), np.float32)
                mfcc[slot] = mf.reshape(f, -1)
            active[slot] = True
        with self._lock:
            audio, self._state = self.synth.step_stateless_masked(
                self._state, f0, loud, active, mfcc_frames=mfcc
            )
            rows = np.asarray(audio[jnp.asarray(order, jnp.int32)])
        return {s: rows[i] for i, s in enumerate(order)}
