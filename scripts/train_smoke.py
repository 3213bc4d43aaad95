#!/usr/bin/env python
"""TPU training smoke: synthetic 48 kHz dataset → short train → export.

Produces runs/smoke + export/ddsp_smoke_bundle, then prints the loss
trajectory.  Used as the end-to-end drive for the training/export path on
real hardware (see .claude/skills/verify/SKILL.md).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=300)
    p.add_argument("--root", default="/tmp/ddsp_smoke")
    p.add_argument("--sample-rate", type=int, default=48000)
    p.add_argument("--platform", default=None, help="cpu to force CPU")
    p.add_argument(
        "--model",
        default="single-inst-decoder",
        choices=["single-inst-decoder", "mfcc-autoencoder"],
    )
    p.add_argument("--device-cache", action="store_true")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.training import Trainer

    sr = args.sample_rate
    block = 512
    sl = 4 * block * 24  # ~1 s chunks (48 frames... keep small-ish)
    cache = os.path.join(args.root, "cache")
    if not os.path.exists(cache):
        make_synthetic_dataset(
            cache,
            n_items=8,
            sample_rate=sr,
            signal_length=sl,
            block_size=block,
            n_harmonic=32,
        )

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": sl,
                "block_size": block,
                "out_dir": cache,
            },
            "model": {
                "name": args.model,
                "kwargs": {
                    "hidden_size": 512,
                    "n_harmonic": 64,
                    "n_bands": 65,
                    "sample_rate": sr,
                    "block_size": block,
                    "has_reverb": True,
                },
            },
            "train": {
                "scales": [4096, 2048, 1024, 512, 256, 128],
                "overlap": 0.75,
                "batch": 4,
                "lr": 1e-3,
                "steps": args.steps,
                "checkpoint_every_steps": 100,
                "val_interval_epochs": 50,
                "log_interval_epochs": 25,
            },
        }
    )

    tag = "smoke" if args.model == "single-inst-decoder" else "smoke-ae"
    run_dir = os.path.join(args.root, "runs", tag)
    dm = Datamodule(cfg, device_cache=args.device_cache)
    dm.setup()
    trainer = Trainer(cfg, run_dir, use_tensorboard=False)
    try:
        trainer.fit(dm)
    finally:
        trainer.close()

    losses = []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "loss":
                losses.append(rec["value"])
    n = len(losses)
    print(f"steps: {n}")
    print(f"loss first10 mean: {sum(losses[:10]) / max(len(losses[:10]), 1):.4f}")
    print(f"loss last10  mean: {sum(losses[-10:]) / max(len(losses[-10:]), 1):.4f}")

    bundle = export_run(run_dir, os.path.join(args.root, "export"), name=tag)
    print(f"bundle: {bundle}")


if __name__ == "__main__":
    main()
