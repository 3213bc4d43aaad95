#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line with the headline metric.

Metric: ×-realtime synthesis factor at 48 kHz for a 100-harmonic voice
(BASELINE.md north-star config #2), measured with the reference's
performance.py protocol (synthesize 2^ceil(log2(sr)) samples from random
inputs, mean wall-clock over N runs) through the full streaming synth
(GRU decoder + Pallas oscillator + filtered noise).

vs_baseline: ratio against the >100× realtime/chip target from BASELINE.md
(the reference publishes no numbers of its own).
"""

import json
import math
import time


BASELINE_X_REALTIME = 100.0  # BASELINE.md target: >100x realtime per chip


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.streaming import StreamingSynth

    sr, block = 48000, 512
    batch = 1  # per-voice realtime factor; samples/s/chip scales with batch
    config = Config()
    config.preprocess.sample_rate = sr
    config.preprocess.block_size = block
    config.model.kwargs.update(
        hidden_size=512,
        n_harmonic=100,  # north-star voice: 100 harmonics
        n_bands=65,
        sample_rate=sr,
        block_size=block,
    )
    model = load_model(config)

    n = 2 ** math.ceil(math.log2(sr))
    n = (n // block) * block
    f = n // block
    rng = jax.random.PRNGKey(0)
    init_batch = {
        "sig": jnp.zeros((batch, n), jnp.float32),
        "pitch": jnp.full((batch, f, 1), 220.0, jnp.float32),
        "loudness": jnp.zeros((batch, f, 1), jnp.float32),
    }
    params = model.init({"params": rng, "noise": rng}, init_batch)["params"]
    synth = StreamingSynth(model, params, batch=batch)

    npr = np.random.default_rng(0)
    pitch = npr.uniform(100, 400, (batch, n)).astype(np.float32)
    loud = npr.standard_normal((batch, n)).astype(np.float32)

    jax.block_until_ready(synth.step_samples(pitch, loud))  # compile

    n_run = 20
    mean = 0.0
    for i in range(n_run):
        st = time.perf_counter()
        out = synth.step_samples(pitch, loud)
        jax.block_until_ready(out)
        mean += (time.perf_counter() - st - mean) / (i + 1)

    x_realtime = batch * n / (mean * sr)
    print(
        json.dumps(
            {
                "metric": "x_realtime_48k_100harm",
                "value": round(x_realtime, 2),
                "unit": "x_realtime",
                "vs_baseline": round(x_realtime / BASELINE_X_REALTIME, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
