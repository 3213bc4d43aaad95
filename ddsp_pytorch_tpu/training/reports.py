"""Reconstruction report: the 2×3 diagnostic figure.

Parity: reference decoder.py:160-191 / encoder.py:105-141 — mel spectrograms
of original and reconstruction, f0 and loudness traces, noise magnitudes and
harmonic distribution heatmaps.
"""

from __future__ import annotations

import numpy as np

from ddsp_pytorch_tpu.ops import stft_to_mel
from ddsp_pytorch_tpu.utils.plots import _plt, plot_f0, plot_loudness, plot_spec


def reconstruction_report(output: dict, config, index: int = 0):
    """Build the figure from an eval-step output dict."""
    plt = _plt()
    fig, axes = plt.subplots(nrows=2, ncols=3, figsize=(12, 5))

    scales = config.train.scales
    sr = config.preprocess.sample_rate
    scale_idx = len(scales) // 2
    n_fft = scales[scale_idx]

    ori = np.asarray(output["sig_stft"][scale_idx][index])
    rec = np.asarray(output["rec_stft"][scale_idx][index])
    axes[0][0].set_title("Original")
    plot_spec(np.asarray(stft_to_mel(ori, sr, n_fft)), axes[0][0])
    axes[1][0].set_title("Reconstruction")
    plot_spec(np.asarray(stft_to_mel(rec, sr, n_fft)), axes[1][0])

    plot_f0(axes[0][1], np.asarray(output["f0"]), index)
    plot_loudness(axes[1][1], np.asarray(output["loudness"]), index)

    noise_mags = np.asarray(output["noise_ctrls"]["magnitudes"][index]).T
    axes[0][2].set_title("noise magnitude")
    axes[0][2].set_xlabel("frames")
    axes[0][2].set_ylabel("frequency bin")
    plot_spec(noise_mags, axes[0][2])

    harm = np.asarray(output["harmonic_ctrls"]["harmonic_distribution"][index]).T
    axes[1][2].set_title("harmonic distribution")
    axes[1][2].set_xlabel("frames")
    axes[1][2].set_ylabel("harmonic number")
    plot_spec(harm, axes[1][2])

    fig.suptitle("reconstruction report")
    fig.tight_layout()
    return fig
