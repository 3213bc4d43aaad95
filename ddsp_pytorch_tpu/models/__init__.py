"""L1/L2 — synthesizer modules and models (flax.linen).

Model registry parity: reference train.py:31-43 maps config ``model.name`` →
class.  Same names, same kwargs schema:

  "single-inst-decoder" → DDSPDecoder      (pitch+loudness → audio)
  "mfcc-autoencoder"    → DDSPAutoencoder  (adds an MFCC-derived latent z)
"""

from ddsp_pytorch_tpu.models.modules import (  # noqa: F401
    FilteredNoise,
    HarmonicSynth,
    Reverb,
)
from ddsp_pytorch_tpu.models.decoder import GRUDecoder, DDSPDecoder  # noqa: F401
from ddsp_pytorch_tpu.models.encoder import MFCCEncoder, DDSPAutoencoder  # noqa: F401
from ddsp_pytorch_tpu.models.crepe import CREPE, extract_pitch_crepe  # noqa: F401

MODEL_REGISTRY = {
    "single-inst-decoder": DDSPDecoder,
    "mfcc-autoencoder": DDSPAutoencoder,
}


def load_model(config):
    """Build a model from a Config (or raw dict) by registry name.

    Mirrors reference train.py:31-43 (`load_model`).  `kwargs.dtype` may be
    a string ("bfloat16"/"float32") for YAML friendliness; train.use_bf16
    sets bf16 NN compute when kwargs don't specify a dtype.
    """
    import jax.numpy as jnp

    if hasattr(config, "model"):
        name, kwargs = config.model.name, dict(config.model.kwargs)
        use_bf16 = getattr(config.train, "use_bf16", False)
    else:
        name, kwargs = config["model"]["name"], dict(config["model"]["kwargs"])
        use_bf16 = config.get("train", {}).get("use_bf16", False)
    if name not in MODEL_REGISTRY:
        raise ValueError(
            f"invalid model name: {name} (have {sorted(MODEL_REGISTRY)})"
        )
    if isinstance(kwargs.get("dtype"), str):
        kwargs["dtype"] = jnp.dtype(kwargs["dtype"]).type
    elif "dtype" not in kwargs and use_bf16:
        kwargs["dtype"] = jnp.bfloat16
    return MODEL_REGISTRY[name](**kwargs)
