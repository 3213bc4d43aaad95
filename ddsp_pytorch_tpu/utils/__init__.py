"""Utilities: plotting, unit conversions, audio IO.

Parity: reference ddsp/utils.py (plot_sig/plot_spec/hz_to_midi/midi_to_hz/
tonp/stft_to_mel/plot_f0/plot_loudness/log_step — the log_step equivalent
lives in training/reports.py).
"""

from ddsp_pytorch_tpu.utils.units import hz_to_midi, midi_to_hz, tonp  # noqa: F401
from ddsp_pytorch_tpu.utils.audio_io import load_wav, save_wav  # noqa: F401
from ddsp_pytorch_tpu.utils.plots import (  # noqa: F401
    plot_sig,
    plot_spec,
    plot_f0,
    plot_loudness,
)
