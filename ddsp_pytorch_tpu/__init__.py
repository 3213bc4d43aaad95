"""ddsp_pytorch_tpu — a TPU-native Differentiable DSP (DDSP) framework.

A from-scratch JAX / XLA / Pallas re-design of the capabilities of
hugofloresgarcia/ddsp_pytorch (DDSP, Engel et al. 2020): a neural decoder maps
frame-rate control signals (f0 + A-weighted loudness, optionally an MFCC
latent) onto the parameters of classical DSP synthesizers — a harmonic
oscillator bank, a filtered-noise synthesizer and a trainable convolution
reverb — trained with a multi-scale STFT spectral loss.

Layer map (mirrors the reference's layering, re-designed TPU-first):

  ops/        L0  pure-JAX + Pallas DSP kernels (oscillator, FIR, STFT, ...)
  models/     L1+L2  synth modules + GRU decoder / MFCC autoencoder (flax)
  data/       L3  preprocessing (pitch, loudness, MFCC) + npy cache + loaders
  training/   L4  jitted/pjitted train step, loss, checkpointing, metrics
  parallel/   —   device mesh, shardings, halo collectives, distributed scan
  export/     L5  deployable param bundle + reverb IR wav + frozen config
  streaming/  L6a stateful block-streaming inference (GRU/phase/OLA carry)
  runtime/    L6b C++ double-buffered block pipeline driving the step fn
  utils/      plotting, audio IO, unit helpers

Reference layer map: /root/reference (see SURVEY.md §1-§2 for the inventory
this package implements feature-for-feature).
"""

__version__ = "0.1.0"

from ddsp_pytorch_tpu import config  # noqa: F401
from ddsp_pytorch_tpu import ops  # noqa: F401

# Heavier subpackages (models pull in flax; training pulls in optax/orbax) are
# imported lazily so `import ddsp_pytorch_tpu` stays light for ops-only users.
_LAZY_SUBMODULES = (
    "models",
    "data",
    "training",
    "parallel",
    "export",
    "streaming",
    "utils",
)


def __getattr__(name):
    if name in _LAZY_SUBMODULES:
        import importlib

        module = importlib.import_module(f"ddsp_pytorch_tpu.{name}")
        globals()[name] = module
        return module
    raise AttributeError(f"module 'ddsp_pytorch_tpu' has no attribute {name!r}")
