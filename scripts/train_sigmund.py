#!/usr/bin/env python
"""End-to-end training through the SIGMUND ingestion path (round-5
VERDICT #8) — the one reference pipeline that had never fed a committed
artifact.

The reference's pretrained sax/violin models were preprocessed by a Pure
Data patch (reference patches/preprocess.pd: `sigmund~ -hop 512` → pitch
(MIDI) → `mtof` → Hz, plus a loudness outlet, both `lop~ 1000`-smoothed)
recording a 3-channel wav that preprocess_from_sigmund.py:10-44 chunks
and decimates.  This container has no Pd + sigmund~ and no real
recordings, so this script emulates the PATCH faithfully and drives the
real ingestion end to end:

  1. fixture performance audio (data/fixtures.py notes, degraded through
     the full_chain recording condition) — the "musician"
  2. a sigmund~-style ANALYZER pass over that degraded audio: per-block
     YIN pitch (an estimator, like sigmund~ — not ground truth) held to
     sample rate, and A-weighted loudness likewise, both smoothed by a
     one-pole low-pass at 1 kHz (exactly Pd's `lop~ 1000`)
  3. a 3-channel float32 wav per partition (ch0 audio, ch1 pitch Hz,
     ch2 loudness) — the patch's recording format
  4. data/sigmund.py preprocess_from_sigmund → .npy cache (no MFCC, like
     the reference path)
  5. train.py --segment-steps on the attached TPU → export_run bundle

Outputs pretrained/ddsp_sigmund_bundle/ + pretrained/sigmund_loss.json.

Usage:  python scripts/train_sigmund.py --steps 10000
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_config(root: str, args) -> str:
    from _workload import write_workload_yaml

    return write_workload_yaml(
        os.path.join(root, "sigmund.yaml"),
        data_location=os.path.join(root, "wavs"),
        out_dir=os.path.join(root, "cache"),
        train={
            "batch": args.batch,
            "steps": args.steps,
            "steps_per_call": args.steps_per_call,
        },
    )


_PREP = r"""
import jax; jax.config.update('jax_platforms', 'cpu')
import os, sys, json
import numpy as np
sys.path.insert(0, {repo!r})
from scipy.io import wavfile
from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.data.fixtures import make_oof_corpus, make_degrader, DEGRADATIONS
from ddsp_pytorch_tpu.data.sigmund import preprocess_from_sigmund
from ddsp_pytorch_tpu.ops import extract_pitch, extract_loudness
from ddsp_pytorch_tpu.utils.audio_io import load_wav

root = {root!r}
sr, block, sl = 48000, 512, 192000

def lop(x, fc=1000.0):
    # Pd's lop~: one-pole low-pass y[n] = y[n-1] + a*(x[n] - y[n-1])
    from scipy.signal import lfilter
    a = 1.0 - np.exp(-2.0 * np.pi * fc / sr)
    zi = np.asarray([(1.0 - a) * x[0]])
    y, _ = lfilter([a], [1.0, -(1.0 - a)], x, zi=zi)
    return y.astype(np.float32)

corpus = os.path.join(root, 'corpus')
if not os.path.exists(corpus):
    make_oof_corpus(corpus, sample_rate=sr, note_seconds=sl / sr,
                    n_train={n_train}, n_validation={n_validation}, seed=0,
                    degrade_fn=make_degrader(**DEGRADATIONS['full_chain']))

os.makedirs(os.path.join(root, 'wavs'), exist_ok=True)
for partition in ('train', 'validation'):
    out_wav = os.path.join(root, 'wavs', partition + '.wav')
    if os.path.exists(out_wav):
        continue
    part_dir = os.path.join(corpus, partition)
    sigs = []
    for f in sorted(os.listdir(part_dir)):
        if f.endswith('.wav'):
            x, _ = load_wav(os.path.join(part_dir, f), sr)
            sigs.append(np.asarray(x, np.float32))
    audio = np.concatenate(sigs)
    # sigmund~-style analyzer channels: estimates from the DEGRADED audio
    f0_blocks = np.concatenate([
        np.asarray(extract_pitch(s, sr, block)) for s in sigs])
    loud_blocks = np.concatenate([
        np.asarray(extract_loudness(s[None, :], sr, block))[0] for s in sigs])
    pitch_ch = lop(np.repeat(f0_blocks, block).astype(np.float32))
    loud_ch = lop(np.repeat(loud_blocks, block).astype(np.float32))
    n = len(audio)
    tri = np.stack([audio, pitch_ch[:n], loud_ch[:n]], axis=1)
    wavfile.write(out_wav, sr, tri.astype(np.float32))
    print(partition, tri.shape)

cfg = Config.from_yaml(os.path.join(root, 'sigmund.yaml'))
if not os.path.exists(os.path.join(cfg.preprocess.out_dir, 'train', 'signals.npy')):
    for partition in ('train', 'validation'):
        preprocess_from_sigmund(
            os.path.join(root, 'wavs', partition + '.wav'), cfg, partition)
print('prep done')
"""


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--segment-steps", type=int, default=5000)
    p.add_argument("--steps-per-call", type=int, default=50)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--n-train", type=int, default=18)
    p.add_argument("--n-validation", type=int, default=4)
    p.add_argument("--root", default="/tmp/ddsp_sigmund")
    p.add_argument("--out", default="pretrained")
    p.add_argument("--tag", default="sigmund")
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    cfg_path = _write_config(args.root, args)

    t0 = time.time()
    print("[sigmund] prep (CPU child): corpus -> 3-channel wav -> cache",
          flush=True)
    subprocess.run(
        [sys.executable, "-c",
         _PREP.format(repo=REPO, root=args.root, n_train=args.n_train,
                      n_validation=args.n_validation)],
        check=True,
    )

    print("[sigmund] segmented training ...", flush=True)
    subprocess.run(
        [sys.executable, os.path.join(REPO, "train.py"),
         "--config", cfg_path, "--root", os.path.join(args.root, "runs"),
         "--name", args.tag, "--device-cache",
         "--segment-steps", str(args.segment_steps)],
        check=True,
    )

    run_dir = os.path.join(args.root, "runs", args.tag)
    print("[sigmund] validate + export (own process) ...", flush=True)
    code = f"""
import os, sys
sys.path.insert(0, {REPO!r})
from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.data import Datamodule
from ddsp_pytorch_tpu.training import Trainer
from ddsp_pytorch_tpu.export import export_run
run_dir = {run_dir!r}
cfg = Config.from_yaml(os.path.join(run_dir, 'config.yaml'))
dm = Datamodule(cfg, device_cache=True); dm.setup()
trainer = Trainer(cfg, run_dir, use_tensorboard=False)
sample = next(iter(dm.train_dataloader()))
state, resumed = trainer.resume_or_init(
    trainer.shard_batch(sample), cfg.data.mean_loudness, cfg.data.std_loudness)
assert resumed
trainer._run_validation(state, dm.val_dataloader(), int(state.step))
trainer.close()
bundle = export_run(run_dir, {args.out!r}, name={args.tag!r})
print('bundle:', bundle)
"""
    subprocess.run([sys.executable, "-c", code], check=True)

    losses, val_losses = [], []
    with open(os.path.join(run_dir, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if rec["tag"] == "loss":
                losses.append(rec["value"])
            elif rec["tag"] == "loss/val":
                val_losses.append(rec["value"])
    traj = {
        "corpus": "out-of-family fixtures, full_chain degradation "
                  "(reverb + mic chain + 10 dB SNR pink)",
        "pipeline": "fixtures wav -> sigmund~-emulated 3-channel wav "
                    "(YIN pitch + A-loudness channels, lop~1000-smoothed) "
                    "-> data/sigmund.py ingestion -> segmented train -> "
                    "export (reference preprocess_from_sigmund.py:10-44 "
                    "parity path)",
        "steps": len(losses),
        "batch": args.batch,
        "wall_s": round(time.time() - t0, 1),
        "loss_first10_mean": sum(losses[:10]) / max(len(losses[:10]), 1),
        "loss_last100_mean": sum(losses[-100:]) / max(len(losses[-100:]), 1),
        "val_losses": val_losses,
        "loss_curve_every_100": losses[::100],
    }
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, f"{args.tag}_loss.json"), "w") as f:
        json.dump(traj, f, indent=2)
    print(json.dumps({k: traj[k] for k in (
        "steps", "wall_s", "loss_first10_mean", "loss_last100_mean")},
        indent=2))


if __name__ == "__main__":
    main()
