"""Causal block-streaming MFCC extraction (host-side numpy).

Stateful streaming-session machinery lives here in streaming/ (ops/ is
pure functions only — CLAUDE.md conventions); the frame math it must match
is ops/spectral.py `mfcc`.
"""

from __future__ import annotations

import numpy as np

from ddsp_pytorch_tpu.ops.spectral import (
    dct_matrix,
    hann_window,
    mel_filterbank,
)


class StreamingMFCC:
    """Causal block-streaming MFCC emitting exactly the offline `mfcc` frames.

    Offline, frame j of `mfcc(signal, hop_length=hop)` windows samples
    [j·hop − n_fft/2, j·hop + n_fft/2) of the center-reflect-padded signal;
    the data pipeline keeps frames 0..F−1 aligned with the pitch/loudness
    frames (reference ddsp/preprocess.py:30-32 + ddsp/data.py:25).  This
    class buffers pushed audio and emits each frame as soon as its last
    dependency sample has arrived: frame j needs j·hop + n_fft/2 samples,
    except frame 0, whose left reflect pad mirrors x[1..n_fft/2] and so
    needs n_fft/2 + 1 samples.  With the reference geometry (n_fft = 2·hop)
    that is one frame per hop-sized block from block 1 onward (block 1
    releases frames 0 and 1) — block-rate feature extraction with no
    lookahead beyond the first block.

    The one offline dependency that cannot be causal is librosa's top_db
    floor, which clips against the *global* spectrogram max (power_to_db) —
    i.e. against future frames.  Streaming therefore floors against a fixed
    `ref_db` (None disables the floor); pass the same ref_db to offline
    `mfcc` for exact equivalence (tests/test_spectral.py).

    This is the realtime front-end for the MFCC-autoencoder's streaming path
    (models/encoder.py streaming_step) — a capability the reference does not
    have at all (its autoencoder has no realtime_forward, encoder.py:29-141).
    """

    def __init__(
        self,
        sample_rate: int,
        *,
        batch: int = 1,
        n_mfcc: int = 30,
        n_fft: int = 1024,
        hop_length: int = 512,
        fmin: float = 20.0,
        fmax: float = 8000.0,
        n_mels: int = 128,
        ref_db: float | None = None,
    ):
        if n_fft > 2 * hop_length:
            raise ValueError(
                "StreamingMFCC requires n_fft <= 2*hop_length (frame j must "
                f"be computable from blocks 0..j); got n_fft={n_fft}, "
                f"hop={hop_length}"
            )
        self.sample_rate = int(sample_rate)
        self.batch = int(batch)
        self.n_mfcc = int(n_mfcc)
        self.n_fft = int(n_fft)
        self.hop = int(hop_length)
        self.ref_db = ref_db
        # Host-side numpy throughout: this extractor runs per block on the
        # serving/realtime host thread, where a jnp implementation would pay
        # ~10 tiny device dispatches (plus a device→host pull) per push —
        # through a remote-TPU tunnel that dwarfs the synth step itself.
        self._fb = mel_filterbank(sample_rate, n_fft, n_mels, fmin, fmax)
        self._dct = dct_matrix(n_mfcc, n_mels)
        self._win = np.asarray(hann_window(self.n_fft), np.float32)
        self.reset()

    def reset(self) -> None:
        self._raw = np.zeros((self.batch, 0), np.float32)  # pre-pad stash
        self._buf = None  # padded stream tail from the next frame's window on
        self._next = 0  # index of the next frame to emit

    def push(self, samples) -> np.ndarray:
        """Append (B, n) samples; return all newly computable MFCC frames
        (B, k, n_mfcc), k >= 0 (k varies at stream start)."""
        samples = np.asarray(samples, np.float32)
        if samples.ndim != 2 or samples.shape[0] != self.batch:
            raise ValueError(f"expected (batch={self.batch}, n) samples")
        pad = self.n_fft // 2
        if self._buf is None:
            self._raw = np.concatenate([self._raw, samples], axis=1)
            if self._raw.shape[1] < pad + 1:
                return np.zeros((self.batch, 0, self.n_mfcc), np.float32)
            # enough history to build the left reflect pad exactly as
            # jnp.pad(mode='reflect') does offline: x[pad], ..., x[1]
            left = self._raw[:, 1 : pad + 1][:, ::-1]
            self._buf = np.concatenate([left, self._raw], axis=1)
            self._raw = np.zeros((self.batch, 0), np.float32)
        else:
            self._buf = np.concatenate([self._buf, samples], axis=1)

        n_avail = (
            (self._buf.shape[1] - self.n_fft) // self.hop + 1
            if self._buf.shape[1] >= self.n_fft
            else 0
        )
        if n_avail <= 0:
            return np.zeros((self.batch, 0, self.n_mfcc), np.float32)

        # Same op sequence as offline mfcc(): per-frame window → rfft →
        # power → mel → dB floor → DCT (each frame independent, so the
        # values match the offline batch computation to f32 tolerance).
        seg = self._buf[:, : (n_avail - 1) * self.hop + self.n_fft]
        idx = (
            np.arange(n_avail)[:, None] * self.hop
            + np.arange(self.n_fft)[None, :]
        )
        frames = seg[:, idx] * self._win  # (B, k, n_fft)
        power = np.square(np.abs(np.fft.rfft(frames, axis=-1))).astype(
            np.float32
        )
        mel = np.einsum("mf,bkf->bkm", self._fb, power)
        log_spec = 10.0 * np.log10(np.maximum(1e-10, mel))
        if self.ref_db is not None:
            log_spec = np.maximum(log_spec, np.float32(self.ref_db) - 80.0)
        out = np.einsum("cm,bkm->bkc", self._dct, log_spec)  # (B, k, n_mfcc)

        self._buf = self._buf[:, n_avail * self.hop :]
        self._next += n_avail
        return out
