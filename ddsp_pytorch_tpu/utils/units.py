"""Unit conversions (reference ddsp/utils.py:41-53)."""

import numpy as np


def hz_to_midi(freqs):
    return 12.0 * np.log2(np.asarray(freqs) / 440.0) + 69.0


def midi_to_hz(midi):
    return 440.0 * 2.0 ** ((np.asarray(midi) - 69.0) / 12.0)


def tonp(x):
    """Device array → numpy (reference's tensor.detach().cpu().numpy())."""
    return np.asarray(x)
