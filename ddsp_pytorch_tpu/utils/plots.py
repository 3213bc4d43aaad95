"""Diagnostic plotting (reference ddsp/utils.py:16-62).

matplotlib is imported lazily with the Agg backend so headless training
workers never touch a display.
"""

from __future__ import annotations

import numpy as np

from ddsp_pytorch_tpu.utils.units import hz_to_midi, tonp


def _plt():
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_sig(sig, ax, stem: bool = False):
    if stem:
        ax.stem(np.asarray(sig))
    else:
        ax.plot(np.asarray(sig))
    ax.set_xlabel("sample")
    return ax


def _amplitude_to_db(mag: np.ndarray) -> np.ndarray:
    power = np.square(np.maximum(np.asarray(mag, np.float64), 1e-10))
    db = 10.0 * np.log10(power)
    return np.maximum(db, db.max() - 80.0)


def plot_spec(stft_mag, ax, amp_to_db: bool = True):
    plt = _plt()
    mag = np.asarray(stft_mag)
    img = _amplitude_to_db(mag) if amp_to_db else mag
    im = ax.imshow(img, aspect="auto")
    plt.gcf().colorbar(im, ax=ax)
    ax.invert_yaxis()
    return ax


def plot_f0(ax, f0, index: int = 0):
    f0 = tonp(f0)[index].squeeze(-1)
    ax.set_title("F0 (MIDI)")
    ax.set_ylim([-1, 128])
    plot_sig(hz_to_midi(f0), ax)


def plot_loudness(ax, loudness, index: int = 0):
    loudness = tonp(loudness)[index].squeeze(-1)
    ax.set_title("Loudness")
    plot_sig(loudness, ax)
