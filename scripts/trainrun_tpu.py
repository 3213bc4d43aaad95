#!/usr/bin/env python
"""Sustained end-to-end training on the real TPU — the TRAINRUN artifact.

Runs the FULL reference training budget (500 k steps, batch 16, the
reference workload: 48 kHz, 192 000-sample/4 s chunks, block 512, hidden
512, 64 harmonics, 65 noise bands, reverb, 6-scale 0.75-overlap loss —
reference config.yaml:5-28) end-to-end on the attached TPU via the
segmented-process workflow (`train.py --segment-steps`), and writes
TRAINRUN_r04.json: total wall-clock, per-segment sustained steps/s, loss
curve, final validation loss, segment count.

Pipeline (each stage its own process — the tunnel-degradation discipline,
BASELINE.md 'degraded windows'):
  1. prep   (CPU):  out-of-family corpus (data/fixtures.py) → wavs →
                    preprocess.py (YIN pitch + A-loudness + MFCC) → cache
  2. train  (TPU):  train.py --segment-steps — a stats-priming child, then
                    N pull-free training segments stitched by exact
                    checkpoint resume; persistent XLA cache amortizes the
                    compile to the first segment
  3. validate(TPU): final checkpoint scored over the validation partition
  4. report (host): segments.jsonl + metrics.jsonl → TRAINRUN JSON

Usage:
  python scripts/trainrun_tpu.py                      # full 500 k budget
  python scripts/trainrun_tpu.py --steps 10000 --segment-steps 5000  # rehearsal
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_config(
    root: str, steps: int, steps_per_call: int, unroll: int = 1,
    pitch_tracker: str = "hybrid",
) -> str:
    """The reference workload (config.yaml:5-28) + the pull-free-segment
    train knobs (flush/checkpoint/val/log deferred to segment tails).
    Round 5: preprocessing runs the shipped DEFAULT tracker (hybrid =
    CREPE×YIN fusion) so the flagship artifact exercises the default
    pipeline end-to-end."""
    from _workload import write_workload_yaml

    return write_workload_yaml(
        os.path.join(root, "trainrun.yaml"),
        data_location=os.path.join(root, "corpus"),
        out_dir=os.path.join(root, "cache"),
        preprocess={"pitch_tracker": pitch_tracker},
        train={
            "steps": steps,
            "steps_per_call": steps_per_call,
            "scan_unroll": unroll,
        },
    )


def _prep(args, root: str) -> None:
    """Child-process corpus synthesis + preprocessing (CPU: its JAX ops
    pull results to disk, which must not happen in a training process)."""
    code = f"""
import jax; jax.config.update('jax_platforms', 'cpu')
import os, sys
sys.path.insert(0, {REPO!r})
from pathlib import Path
from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.data.fixtures import make_oof_corpus
from ddsp_pytorch_tpu.data.preprocess import preprocess_folder
corpus = os.path.join({root!r}, 'corpus')
if not os.path.exists(corpus):
    make_oof_corpus(corpus, sample_rate=48000, note_seconds=4.0,
                    n_train={args.n_train}, n_validation={args.n_validation},
                    seed=0)
cfg = Config.from_yaml({os.path.join(root, 'trainrun.yaml')!r})
if not os.path.exists(os.path.join(cfg.preprocess.out_dir, 'train', 'signals.npy')):
    for partition in ('train', 'validation'):
        preprocess_folder(Path(corpus), partition, cfg)
print('prep done')
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def _platform_probe() -> dict:
    code = """
import jax, json
d = jax.devices()[0]
print(json.dumps({"platform": d.platform,
                  "device_kind": getattr(d, "device_kind", "?"),
                  "n_devices": jax.device_count()}))
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def _validate(root: str, run_dir: str) -> None:
    """Final-checkpoint validation loss over the full validation partition
    (its own process; pulls are fine here)."""
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.data import Datamodule
from ddsp_pytorch_tpu.training import Trainer
run_dir = {run_dir!r}
cfg = Config.from_yaml(os.path.join(run_dir, 'config.yaml'))
dm = Datamodule(cfg, device_cache=True); dm.setup()
trainer = Trainer(cfg, run_dir, use_tensorboard=False)
sample = next(iter(dm.train_dataloader()))
state, resumed = trainer.resume_or_init(
    trainer.shard_batch(sample), cfg.data.mean_loudness, cfg.data.std_loudness)
assert resumed, 'no checkpoint to validate'
trainer._run_validation(state, dm.val_dataloader(), int(state.step))
trainer.close()
print('validated at step', int(state.step))
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def _report(args, root, run_dir, probe, wall_total) -> dict:
    segs = [json.loads(l) for l in open(os.path.join(run_dir, "segments.jsonl"))]
    rows = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    losses = [(r["step"], r["value"]) for r in rows if r["tag"] == "loss"]
    losses.sort()
    windows = [(r["step"], r["value"]) for r in rows
               if r["tag"] == "train_window_steps_per_s"]
    val = [(r["step"], r["value"]) for r in rows if r["tag"] == "loss/val"]

    train_segs = [s for s in segs if s["label"] == "train" and s["returncode"] == 0]
    prev = 0
    per_segment = []
    for s, w in zip(train_segs, sorted(windows)):
        n = s["to_step"] - prev
        per_segment.append({
            "to_step": s["to_step"],
            "steps": n,
            "wall_s": s["wall_s"],
            "steps_per_s_wall": round(n / s["wall_s"], 1),
            "steps_per_s_train_window": round(w[1], 1),
        })
        prev = s["to_step"]

    n_steps = losses[-1][0] if losses else 0
    train_wall = sum(s["wall_s"] for s in train_segs)
    prime_wall = sum(s["wall_s"] for s in segs if s["label"] == "prime-stats")
    curve_stride = max(1, len(losses) // 200)
    report = {
        "what": "sustained end-to-end training on the real TPU, full "
                "reference budget via segmented processes "
                "(train.py --segment-steps)",
        "workload": "reference config.yaml:5-28 — batch 16, 48 kHz, "
                    "192000-sample chunks, block 512, hidden 512, "
                    "64 harmonics, 65 bands, reverb, scales [4096..128] "
                    "@ 0.75, Adam lr 1e-3",
        "pipeline": "fixtures corpus (wav) -> preprocess (YIN+A-loudness"
                    "+MFCC) -> segmented train -> validate",
        "platform": probe,
        "total_steps": n_steps,
        "target_steps": args.steps,
        "segment_steps": (args.segment_schedule or args.segment_steps),
        "steps_per_call": args.steps_per_call,
        "scan_unroll": args.unroll,
        "pitch_tracker": args.pitch_tracker,
        "n_train_segments": len(train_segs),
        "wall_clock_total_s": round(wall_total, 1),
        "wall_clock_train_segments_s": round(train_wall, 1),
        "wall_clock_prime_stats_s": round(prime_wall, 1),
        "sustained_steps_per_s_incl_everything": round(
            n_steps / max(train_wall + prime_wall, 1e-9), 1),
        "sustained_steps_per_s_train_segments": round(
            n_steps / max(train_wall, 1e-9), 1),
        "per_segment": per_segment,
        "loss_first10_mean": (
            sum(v for _, v in losses[:10]) / max(len(losses[:10]), 1)),
        "loss_last100_mean": (
            sum(v for _, v in losses[-100:]) / max(len(losses[-100:]), 1)),
        "final_val_loss": val[-1][1] if val else None,
        "loss_curve": [
            {"step": s, "loss": round(v, 4)}
            for s, v in losses[::curve_stride]
        ],
        "notes": "steps_per_s_wall divides segment steps by the CHILD "
                 "PROCESS wall-clock (python+jax import, cache upload, "
                 "compile-cache hit, checkpoint restore, training, metric "
                 "flush, checkpoint save) — through this container's "
                 "tunnel this is the HONEST number: round-4 probes proved "
                 "jax.block_until_ready fake-ACKs on axon (50 queued "
                 "calls 'ready' in 11 ms each, then the first value pull "
                 "waited ~0.4 s x 50 — BASELINE.md 'the tunnel lies'), "
                 "so steps_per_s_train_window (dispatch-rate) is an "
                 "upper-bound dispatch metric, NOT device throughput. "
                 "Real per-step cost on this tunnel is ~0.2-0.3 s "
                 "regardless of program size (per-execution overhead; a "
                 "locally-attached v5e measures ~1 ms for this step).",
    }
    return report


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=500000)
    p.add_argument("--segment-steps", type=int, default=50000)
    p.add_argument(
        "--segment-schedule", default=None, metavar="N1,N2,...",
        help="per-segment sizes (overrides --segment-steps; last size "
        "repeats) — the round-5 escalating segment-size search",
    )
    p.add_argument("--steps-per-call", type=int, default=50)
    p.add_argument("--unroll", type=int, default=1,
                   help="train.scan_unroll (see CEILING_r05.json)")
    p.add_argument("--pitch-tracker", default="hybrid",
                   choices=("hybrid", "yin", "crepe"))
    p.add_argument("--n-train", type=int, default=24)
    p.add_argument("--n-validation", type=int, default=4)
    p.add_argument("--root", default="/tmp/ddsp_trainrun_r05")
    p.add_argument("--out", default=os.path.join(REPO, "TRAINRUN_r05.json"))
    p.add_argument("--skip-validate", action="store_true")
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    cfg_path = _write_config(args.root, args.steps, args.steps_per_call,
                             args.unroll, args.pitch_tracker)
    run_dir = os.path.join(args.root, "runs", "trainrun")

    t0 = time.time()
    print("[trainrun] prep (CPU child) ...", flush=True)
    _prep(args, args.root)

    probe = _platform_probe()
    print(f"[trainrun] platform: {probe}", flush=True)

    print("[trainrun] segmented training ...", flush=True)
    seg_args = (
        ["--segment-schedule", args.segment_schedule]
        if args.segment_schedule
        else ["--segment-steps", str(args.segment_steps)]
    )
    subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", cfg_path, "--root", os.path.join(args.root, "runs"),
         "--name", "trainrun", "--device-cache", *seg_args],
        check=True,
    )

    if not args.skip_validate:
        print("[trainrun] final validation (TPU child) ...", flush=True)
        _validate(args.root, run_dir)

    wall_total = time.time() - t0
    report = _report(args, args.root, run_dir, probe, wall_total)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in (
        "total_steps", "wall_clock_total_s",
        "sustained_steps_per_s_train_segments", "loss_first10_mean",
        "loss_last100_mean", "final_val_loss")}, indent=2))
    print(f"[trainrun] wrote {args.out}")


if __name__ == "__main__":
    main()
