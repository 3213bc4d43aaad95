"""Metrics / logging / observability.

The reference logs scalars, audio and a reconstruction figure to TensorBoard
(train.py:57,132; utils.py:64-87).  Here the primary sink is an append-only
JSONL stream (machine-readable, survives any viewer), with TensorBoard as an
optional secondary sink when `tensorboard` is importable, plus wav dumps for
audio.  All values are fetched from device asynchronously at write time.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


class MetricsWriter:
    def __init__(
        self, run_dir: str, use_tensorboard: bool = True, enabled: bool = True
    ):
        """enabled=False makes every write a no-op — multi-host runs pass
        enabled only on process 0 so N processes sharing a run_dir don't
        interleave writes into the same metrics.jsonl."""
        self.run_dir = run_dir
        self.enabled = enabled
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(run_dir, exist_ok=True)
        self._jsonl = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(run_dir, flush_secs=20)
            except Exception:
                self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        if not self.enabled:
            return
        value = float(value)
        self._jsonl.write(
            json.dumps(
                {"tag": tag, "value": value, "step": int(step), "time": time.time()}
            )
            + "\n"
        )
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def add_audio(self, tag: str, audio, step: int, sample_rate: int) -> None:
        """Write audio both as a wav next to the metrics and to TB."""
        if not self.enabled:
            return
        audio = np.asarray(audio, np.float32).reshape(-1)
        from ddsp_pytorch_tpu.utils.audio_io import save_wav

        wav_dir = os.path.join(self.run_dir, "audio")
        os.makedirs(wav_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        save_wav(
            os.path.join(wav_dir, f"{safe_tag}_{step}.wav"), audio, sample_rate
        )
        if self._tb is not None:
            self._tb.add_audio(tag, audio[None, :], step, sample_rate=sample_rate)

    def add_figure(self, tag: str, fig, step: int) -> None:
        if not self.enabled:
            return
        fig_dir = os.path.join(self.run_dir, "figures")
        os.makedirs(fig_dir, exist_ok=True)
        safe_tag = tag.replace("/", "_")
        fig.savefig(os.path.join(fig_dir, f"{safe_tag}_{step}.png"), dpi=100)
        if self._tb is not None:
            self._tb.add_figure(tag, fig, step)

    def close(self) -> None:
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
