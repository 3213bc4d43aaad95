"""Worker process for the two-process multi-host training test
(tests/test_multihost.py).  Not a test module.

Each process: jax.distributed.initialize over a local Gloo coordinator,
2 virtual CPU devices → a 4-device global 'data' mesh, Datamodule loading
its interleaved shard, Trainer.fit for a few DP steps (batches assembled
with make_array_from_process_local_data — parallel/sharding.py:40-47), then
dump the final replicated params + the frozen loudness stats for the parent
to compare against a single-process reference.
"""

import argparse
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--pid", type=int, required=True)
    p.add_argument("--nproc", type=int, required=True)
    p.add_argument("--port", required=True)
    p.add_argument("--cache", required=True)
    p.add_argument("--run-dir", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--devices-per-proc", type=int, default=2)
    p.add_argument("--steps", type=int, default=3)
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={args.devices_per_proc}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.distributed.initialize(
            coordinator_address=f"localhost:{args.port}",
            num_processes=args.nproc,
            process_id=args.pid,
        )
    except (RuntimeError, NotImplementedError) as e:
        # Only an unavailable distributed backend maps to the skip sentinel;
        # anything else (bad coordinator address, port collision, genuine
        # regression) must fail the parent test, not silently skip it.
        msg = str(e).lower()
        backend_unavailable = any(
            s in msg
            for s in ("unimplemented", "not available", "not implemented",
                      "no distributed", "unavailable")
        )
        if not backend_unavailable:
            raise
        print(f"[worker {args.pid}] jax.distributed.initialize failed: {e!r}")
        return 42  # sentinel: parent test skips instead of failing

    assert jax.process_count() == args.nproc
    assert jax.device_count() == args.nproc * args.devices_per_proc

    import numpy as np

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule
    from ddsp_pytorch_tpu.parallel import make_mesh
    from ddsp_pytorch_tpu.training import Trainer

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": 2048,
                "block_size": 64,
                "out_dir": args.cache,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 16,
                    "n_harmonic": 4,
                    "n_bands": 5,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": False,
                    "use_pallas": "never",
                },
            },
            "train": {
                "scales": [256, 128],
                "batch": 4,  # GLOBAL batch; 2 per process
                "steps": args.steps,
                "checkpoint_every_steps": 1000,
                "val_interval_epochs": 1,
                "log_interval_epochs": 1,
                # SGD: param delta = -lr*grad, so the parent can compare
                # against the single-process reference tightly (Adam
                # amplifies psum reduction-order noise on ~0 grads to ±lr)
                "optimizer": "sgd",
            },
        }
    )
    mesh = make_mesh(data=-1, time=1)
    dm = Datamodule(cfg)
    dm.setup()
    trainer = Trainer(cfg, args.run_dir, mesh=mesh, use_tensorboard=False)
    try:
        state = trainer.fit(dm)
    finally:
        trainer.close()

    params = jax.device_get(state.params)
    flat = {
        "/".join(str(getattr(k, "key", k)) for k in path): np.asarray(v)
        for path, v in jax.tree_util.tree_leaves_with_path(params)
    }
    np.savez(os.path.join(args.out, f"params_{args.pid}.npz"), **flat)
    with open(os.path.join(args.out, f"stats_{args.pid}.json"), "w") as f:
        json.dump(
            {
                "mean_loudness": float(cfg.data.mean_loudness),
                "std_loudness": float(cfg.data.std_loudness),
                "step": int(state.step),
            },
            f,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
