#!/usr/bin/env python
"""Train + export a pretrained instrument bundle (violin / sax / flute).

The reference ships pretrained saxophone + violin artifacts
(/root/reference/README.md:46-49) trained on private recordings; with no
audio corpus in-container, this framework's committed pretrained bundles are
trained on its synthetic instrument families (data/synthetic.py INSTRUMENTS:
vibrato, time-varying rolloff + formant, breath noise) at the reference's
full workload shape (48 kHz, 4 s / 192 000-sample chunks, block 512, hidden
512, 64 harmonics, 65 bands, reverb on, 6-scale 0.75-overlap loss).

Usage (TPU, ~2-4 min each):
  python scripts/train_pretrained.py --instrument violin --steps 4000
  python scripts/train_pretrained.py --instrument sax --steps 4000

Outputs pretrained/ddsp_<instrument>_bundle/ (+ impulse wav + frozen config)
and pretrained/<instrument>_loss.json with the loss trajectory.
"""

import argparse
import json
import os
import sys
import zlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--instrument", default="violin",
                   choices=["violin", "sax", "flute"])
    p.add_argument("--model", default="single-inst-decoder",
                   choices=["single-inst-decoder", "mfcc-autoencoder"])
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--n-items", type=int, default=24)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps-per-call", type=int, default=25)
    p.add_argument("--root", default="/tmp/ddsp_pretrained")
    p.add_argument("--out", default="pretrained")
    p.add_argument("--platform", default=None, help="cpu to force CPU")
    args = p.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule, make_synthetic_dataset
    from ddsp_pytorch_tpu.export import export_run
    from ddsp_pytorch_tpu.training import Trainer

    sr, block, sl = 48000, 512, 192000
    autoencoder = args.model == "mfcc-autoencoder"
    # Autoencoder bundles stream live (docs/usage.md): their MFCCs must use
    # the causal fixed-ref dB floor, so they get their own feature cache.
    mfcc_ref_db = 0.0 if autoencoder else None
    cache = os.path.join(
        args.root,
        f"cache_{args.instrument}" + ("_ae" if autoencoder else ""),
    )
    if not os.path.exists(cache):
        print(f"rendering {args.n_items}x2 synthetic {args.instrument} notes...")
        make_synthetic_dataset(
            cache,
            n_items=args.n_items,
            sample_rate=sr,
            signal_length=sl,
            block_size=block,
            n_harmonic=48,
            instrument=args.instrument,
            mfcc_ref_db=mfcc_ref_db,
            # deterministic per-instrument seed: str hash() is salted per
            # process (PYTHONHASHSEED), which would make the committed
            # bundles' training corpus unreproducible
            seed=zlib.crc32(args.instrument.encode()) % (2**31),
        )

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": sl,
                "block_size": block,
                "out_dir": cache,
                "mfcc_ref_db": mfcc_ref_db,
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
                "batch": args.batch,
                "lr": 1e-3,
                "steps": args.steps,
                "steps_per_call": args.steps_per_call,
                "checkpoint_every_steps": 1000,
                "val_interval_epochs": 200,
                "log_interval_epochs": 100,
            },
        }
    )

    tag = args.instrument + ("_ae" if autoencoder else "")
    run_dir = os.path.join(args.root, "runs", tag)
    dm = Datamodule(cfg, device_cache=True)
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
    traj = {
        "instrument": args.instrument,
        "model": args.model,
        "steps": len(losses),
        "loss_first10_mean": sum(losses[:10]) / max(len(losses[:10]), 1),
        "loss_last10_mean": sum(losses[-10:]) / max(len(losses[-10:]), 1),
        "loss_curve_every_100": losses[::100],
    }
    print(json.dumps({k: traj[k] for k in list(traj)[:4]}, indent=2))

    os.makedirs(args.out, exist_ok=True)
    bundle = export_run(run_dir, args.out, name=tag)
    with open(os.path.join(args.out, f"{tag}_loss.json"), "w") as f:
        json.dump(traj, f, indent=2)
    print(f"bundle: {bundle}")


if __name__ == "__main__":
    main()
