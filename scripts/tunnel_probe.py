#!/usr/bin/env python
"""Diagnose the axon-tunnel transfer-poisoning mode (the receipt for the
CLAUDE.md/BASELINE.md claims about "degraded windows").

Measured mechanism (2026-08-21, this container): the FIRST device→host
transfer of ANY size — even float(scalar) — permanently switches this
process's TPU session into a ~130x-slower-execution mode (a 0.9 ms train
step becomes ~120 ms; a 25-step scan call becomes ~3 s).  Uploads
(host→device) are safe.  jax.extend.backend.clear_backends() reconnects
but does NOT reset the throttle; only a fresh process does.

Consequences:
  * benchmark protocols must never pull device data before or inside
    timed regions (block_until_ready on device arrays only — bench.py,
    scripts/bench_headline.py already comply, which is why their numbers
    are fast while Trainer.fit runs that flush metrics measure ~8 steps/s
    at the same workload);
  * long training runs on tunnel-attached chips should segment across
    processes (exact checkpoint resume makes this free) or accept the
    degraded mode after the first metrics flush / checkpoint save;
  * locally-attached chips (PCIe) have none of this.

Usage:  python scripts/tunnel_probe.py        # prints the 3-phase receipt
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import tempfile

    import jax
    import jax.numpy as jnp
    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.training import Trainer

    cfg = Config.from_dict(
        {
            "preprocess": {"sample_rate": 48000, "signal_length": 192000,
                           "block_size": 512},
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 512, "n_harmonic": 64, "n_bands": 65,
                    "sample_rate": 48000, "block_size": 512,
                    "has_reverb": True,
                },
            },
            "train": {"scales": [4096, 2048, 1024, 512, 256, 128],
                      "overlap": 0.75, "batch": 8},
        }
    )
    trainer = Trainer(cfg, tempfile.mkdtemp(), use_tensorboard=False)
    f = 192000 // 512
    rr = np.random.default_rng(0)
    batch = {
        "sig": jnp.asarray(
            rr.standard_normal((8, 192000)).astype(np.float32) * 0.1
        ),
        "pitch": jnp.asarray(
            rr.uniform(100, 400, (8, f, 1)).astype(np.float32)
        ),
        "loudness": jnp.asarray(
            rr.standard_normal((8, f, 1)).astype(np.float32)
        ),
    }
    state = trainer.init_state(batch)
    state, m = trainer._train_step(state, batch)
    jax.block_until_ready(state.params)

    def step_ms(n=10):
        nonlocal state, m
        t0 = time.monotonic()
        for _ in range(n):
            state, m = trainer._train_step(state, batch)
        jax.block_until_ready(state.params)
        return (time.monotonic() - t0) / n * 1000

    base = step_ms()
    print(f"1. warm train step, no transfers yet:  {base:7.2f} ms/step")

    up = jnp.asarray(rr.standard_normal((8, 192000)).astype(np.float32))
    jax.block_until_ready(up)
    after_up = step_ms()
    print(f"2. after a 6 MB host->device UPLOAD:   {after_up:7.2f} ms/step "
          f"(uploads are safe)")

    _ = float(m["loss"])  # one scalar device->host pull
    after_pull = step_ms()
    print(f"3. after ONE float(loss) device PULL:  {after_pull:7.2f} ms/step "
          f"({after_pull / base:.0f}x)")
    if after_pull > 10 * base:
        print("POISONED: this process's session is now permanently in the "
              "degraded-execution mode (restart the process to reset).")
    else:
        print("no poisoning observed — transport healthy (locally attached "
              "chip, or the tunnel behavior changed).")


if __name__ == "__main__":
    main()
