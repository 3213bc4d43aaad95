"""L0 — DSP functional core (pure JAX + Pallas).

TPU-native re-design of the reference's functional core
(/root/reference/ddsp/core.py).  Everything here is a pure function of
arrays, jit-safe (static shapes, no data-dependent Python control flow) and
differentiable.
"""

from ddsp_pytorch_tpu.ops.core import (  # noqa: F401
    safe_log,
    scale_function,
    remove_above_nyquist,
    upsample,
    resample,
    mean_std_loudness,
)
from ddsp_pytorch_tpu.ops.spectral import (  # noqa: F401
    hann_window,
    frame_signal,
    stft,
    multiscale_fft,
    mel_filterbank,
    dct_matrix,
    power_to_db,
    mfcc,
    amplitude_to_db,
    stft_to_mel,
)
from ddsp_pytorch_tpu.ops.loudness import (  # noqa: F401
    a_weighting,
    fft_frequencies,
    extract_loudness,
)
from ddsp_pytorch_tpu.ops.oscillator import (  # noqa: F401
    harmonic_synth,
    harmonic_synth_frames,
    phase_accumulate_frames,
)
from ddsp_pytorch_tpu.ops.filters import (  # noqa: F401
    amp_to_impulse_response,
    fft_convolve,
    filtered_noise,
)
from ddsp_pytorch_tpu.ops.pitch import extract_pitch  # noqa: F401
