#!/usr/bin/env python
"""Trajectory-level time-sharded training equivalence.

One sharded step matching one unsharded step (tests/
test_time_sharded_training.py) does not show that the per-step ~1e-2-scale
numeric discrepancy (reverb-tail FFT sizes, distributed phase-scan f32
reordering) stays bounded over a training run.  This script trains the SAME
model from the SAME init twice — unsharded vs time-sharded over a
('data','time') mesh, pad-and-mask path engaged (the frame count does not
divide the time axis) — on identical deterministic batch sequences, and
records both loss trajectories plus final parameter distances.

The distributed analogue of the reference's training loop
(/root/reference/train.py:122-146), which is single-device only.

Writes a JSON artifact (default pretrained/time_sharded_trajectory.json);
tests/test_time_sharded_training.py::test_trajectory_time_sharded_equivalence
runs the same harness at a reduced step count and asserts the bounds.

Usage:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/time_sharded_trajectory.py [--steps 400] [--out FILE]
"""

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_trajectories(steps: int = 400, signal_length: int = 4544,
                     window: int = 25, cache_dir: str | None = None) -> dict:
    """Train unsharded vs time-sharded for `steps` identical steps.

    Returns a report dict with both loss trajectories, windowed-mean loss
    comparisons every `window` steps, and final param distances.
    signal_length=4544 (71 frames at block 64) deliberately does NOT divide
    the 4-way time axis, so the pad-and-mask path is the one being soaked.
    """
    import jax
    import numpy as np
    import optax

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import make_synthetic_dataset
    from ddsp_pytorch_tpu.data.dataset import Dataset
    from ddsp_pytorch_tpu.models import load_model
    from ddsp_pytorch_tpu.parallel import make_mesh, replicate_state
    from ddsp_pytorch_tpu.parallel.sharding import (
        shard_time_batch,
        shard_time_train_step,
    )
    from ddsp_pytorch_tpu.training import create_train_state, make_train_step
    from ddsp_pytorch_tpu.training.time_sharded import (
        make_time_sharded_train_step,
        plan_time_padding,
    )

    if len(jax.devices()) < 8:
        raise RuntimeError(
            "needs 8 (virtual) devices: run with "
            "XLA_FLAGS=--xla_force_host_platform_device_count=8 on CPU"
        )

    if cache_dir is None:
        cache_dir = os.path.join(tempfile.mkdtemp(), "cache")
    make_synthetic_dataset(
        cache_dir, n_items=8, sample_rate=16000,
        signal_length=signal_length, block_size=64, n_harmonic=8,
    )
    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": 16000,
                "signal_length": signal_length,
                "block_size": 64,
                "out_dir": cache_dir,
            },
            "model": {
                "name": "single-inst-decoder",
                "kwargs": {
                    "hidden_size": 32,
                    "n_harmonic": 8,
                    "n_bands": 9,
                    "sample_rate": 16000,
                    "block_size": 64,
                    "has_reverb": True,
                    "use_pallas": "never",
                },
            },
            "train": {
                "scales": [512, 256],
                "overlap": 0.75,
                "batch": 4,
                "lr": 1e-3,
            },
        }
    )
    mesh = make_mesh(data=2, time=4)
    plan = plan_time_padding(cfg, mesh)
    assert plan.pad_frames > 0, "trajectory must exercise pad-and-mask"

    ds = Dataset(os.path.join(cfg.preprocess.out_dir, "train"))
    n_items = len(ds)
    loud = np.stack([ds[i]["loudness"] for i in range(n_items)])
    mean_l, std_l = float(loud.mean()), float(loud.std())

    def batch_at(step: int) -> dict:
        b = cfg.train.batch
        idx = [(step * b + j) % n_items for j in range(b)]
        recs = [ds[i] for i in idx]
        import jax.numpy as jnp

        return {
            k: jnp.asarray(np.stack([r[k] for r in recs]))
            for k in recs[0]
        }

    model = load_model(cfg)
    tx = optax.adam(cfg.train.lr)
    sample = batch_at(0)

    def train(sharded: bool):
        state = create_train_state(
            model, sample, tx, seed=0,
            mean_loudness=mean_l, std_loudness=std_l,
        )
        if sharded:
            state = replicate_state(state, mesh)
            step_fn = shard_time_train_step(
                make_time_sharded_train_step(model, tx, cfg, mesh), mesh
            )
        else:
            step_fn = jax.jit(make_train_step(model, tx, cfg))
        losses = []
        t0 = time.monotonic()
        for s in range(steps):
            batch = batch_at(s)
            if sharded:
                batch = shard_time_batch(batch, mesh)
            state, metrics = step_fn(state, batch)
            losses.append(float(metrics["loss"]))
        wall = time.monotonic() - t0
        return state, losses, wall

    state_u, losses_u, wall_u = train(sharded=False)
    state_s, losses_s, wall_s = train(sharded=True)

    # windowed-mean comparisons (robust to step-level optimizer chaos)
    checkpoints = []
    for end in range(window, steps + 1, window):
        mu = float(np.mean(losses_u[end - window:end]))
        ms = float(np.mean(losses_s[end - window:end]))
        checkpoints.append(
            {"step": end, "loss_unsharded": mu, "loss_sharded": ms,
             "rel_diff": abs(ms - mu) / mu}
        )

    params_u = jax.device_get(state_u.params)
    params_s = jax.device_get(state_s.params)
    per_tensor = {}
    num = den = 0.0
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(params_u),
        jax.tree.leaves(params_s),
    ):
        name = "/".join(str(getattr(k, "key", k)) for k in path)
        d = float(np.linalg.norm(np.asarray(b) - np.asarray(a)))
        n = float(np.linalg.norm(np.asarray(a)))
        per_tensor[name] = {"l2_diff": d, "l2": n,
                            "rel": d / max(n, 1e-12)}
        num += d * d
        den += n * n
    global_rel = (num ** 0.5) / max(den ** 0.5, 1e-12)

    return {
        "steps": steps,
        "signal_length": signal_length,
        "pad_frames": plan.pad_frames,
        "frames": plan.frames,
        "frames_pad": plan.frames_pad,
        "optimizer": "adam",
        "lr": cfg.train.lr,
        "window": window,
        "loss_first_window": checkpoints[0],
        "loss_last_window": checkpoints[-1],
        "checkpoints": checkpoints,
        "losses_unsharded": losses_u,
        "losses_sharded": losses_s,
        "final_param_global_rel_l2": global_rel,
        "final_param_per_tensor": per_tensor,
        "wall_s_unsharded": wall_u,
        "wall_s_sharded": wall_s,
    }


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--signal-length", type=int, default=4544)
    p.add_argument("--out", default="pretrained/time_sharded_trajectory.json")
    p.add_argument("--platform", default="cpu")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    report = run_trajectories(steps=args.steps,
                              signal_length=args.signal_length)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"unsharded: {report['loss_last_window']['loss_unsharded']:.4f}  "
          f"sharded: {report['loss_last_window']['loss_sharded']:.4f}  "
          f"(first-window rel diff "
          f"{report['loss_first_window']['rel_diff']:.2e}, last "
          f"{report['loss_last_window']['rel_diff']:.2e})")
    print(f"final param global rel L2: "
          f"{report['final_param_global_rel_l2']:.3e}")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
