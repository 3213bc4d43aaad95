#!/usr/bin/env python
"""Round-5 ceiling search: honest steps/s vs (steps_per_call, scan_unroll).

BASELINE.md "The tunnel lies" established that this container charges
~0.2-0.6 s per executed program / scan iteration regardless of program
size.  This probe measures, with wall-clock-per-child accounting (the
only honest clock here), which dispatch structure minimizes the per-step
charge at the reference training workload:

  * steps_per_call=N  — N optimizer steps per lax.scan call
  * scan_unroll=U     — U step bodies per while-loop iteration
  * steps_per_call=1  — ONE fused gather+step program per optimizer step
                        (training/train.py round-5: the indexed scan is
                        built for spc==1 too)

Protocol per config: a WARM child (>= one scan call) populates the
persistent XLA cache so the MEASURED child (--probe-steps steps) pays no
compile; both are fresh processes resuming the same run via exact
checkpoint resume, so the sweep is also a 2.5k-step training run.
Fixed per-child costs (python+jax import, cache upload, restore, tail
pull+save) are measured by the smallest child and reported separately.

Writes CEILING_r05.json: the table the round-4 VERDICT asked for.

Usage:  python scripts/ceiling_probe.py            # ~20 min on the tunnel
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _write_config(root: str) -> str:
    from _workload import write_workload_yaml

    return write_workload_yaml(
        os.path.join(root, "ceiling.yaml"),
        data_location=os.path.join(root, "corpus"),
        out_dir=os.path.join(root, "cache"),
    )


def _prep(root: str, cfg_path: str) -> None:
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
                    n_train=24, n_validation=4, seed=0)
cfg = Config.from_yaml({cfg_path!r})
if not os.path.exists(os.path.join(cfg.preprocess.out_dir, 'train', 'signals.npy')):
    for partition in ('train', 'validation'):
        preprocess_folder(Path(corpus), partition, cfg)
print('prep done')
"""
    subprocess.run([sys.executable, "-c", code], check=True)


def _fmt_s(wall) -> str:
    """Seconds for the log line; timed-out children report wall=None."""
    return f"{wall:.1f}s" if wall is not None else "--s"


def _child(cfg_path, root, boundary, spc, unroll, timeout_s):
    cmd = [
        sys.executable, os.path.join(REPO, "train.py"),
        "--config", cfg_path, "--root", os.path.join(root, "runs"),
        "--name", "ceiling", "--device-cache",
        "--steps", str(boundary),
        "--set", f"train.steps_per_call={spc}",
        "--set", f"train.scan_unroll={unroll}",
    ]
    t0 = time.time()
    try:
        rc = subprocess.run(cmd, timeout=timeout_s).returncode
    except subprocess.TimeoutExpired:
        return None, "timeout"
    return time.time() - t0, ("ok" if rc == 0 else f"rc={rc}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--root", default="/tmp/ddsp_ceiling")
    p.add_argument("--probe-steps", type=int, default=400)
    p.add_argument("--out", default=os.path.join(REPO, "CEILING_r05.json"))
    p.add_argument(
        "--configs", default="50:1,1:1,50:5,200:1,200:8",
        help="comma list of steps_per_call:unroll",
    )
    p.add_argument("--child-timeout", type=int, default=900)
    args = p.parse_args()

    os.makedirs(args.root, exist_ok=True)
    cfg_path = _write_config(args.root)
    print("[ceiling] prep (CPU child) ...", flush=True)
    _prep(args.root, cfg_path)

    t0 = time.time()
    print("[ceiling] prime-stats child ...", flush=True)
    wall, status = _child(cfg_path, args.root, 0, 1, 1, args.child_timeout)
    # wall is None when the child timed out — keep the sweep alive and
    # record the status instead of crashing on the format
    print(f"[ceiling] prime: {_fmt_s(wall)} {status}", flush=True)

    configs = []
    for tok in args.configs.split(","):
        spc, _, unroll = tok.partition(":")
        configs.append((int(spc), int(unroll or 1)))

    boundary = 0
    rows = []
    for spc, unroll in configs:
        warm = max(spc, 8)
        # one scan call's worth of steps to absorb the (spc, unroll)
        # program's compile into the persistent XLA cache
        boundary += warm
        w_wall, w_status = _child(
            cfg_path, args.root, boundary, spc, unroll, args.child_timeout
        )
        if w_wall is None:
            rows.append({"steps_per_call": spc, "unroll": unroll,
                         "status": f"warm {w_status}"})
            print(f"[ceiling] spc={spc} u={unroll}: warm FAILED "
                  f"({w_status})", flush=True)
            continue
        boundary += args.probe_steps
        m_wall, m_status = _child(
            cfg_path, args.root, boundary, spc, unroll, args.child_timeout
        )
        row = {
            "steps_per_call": spc,
            "unroll": unroll,
            "warm_steps": warm,
            "warm_wall_s": round(w_wall, 1) if w_wall else None,
            "measured_steps": args.probe_steps,
            "measured_wall_s": round(m_wall, 1) if m_wall else None,
            "status": m_status,
            "steps_per_s_wall": (
                round(args.probe_steps / m_wall, 2) if m_wall else None
            ),
            "s_per_step": (
                round(m_wall / args.probe_steps, 4) if m_wall else None
            ),
        }
        rows.append(row)
        print(f"[ceiling] spc={spc} u={unroll}: warm {_fmt_s(w_wall)}, "
              f"measured {row['measured_wall_s']}s "
              f"-> {row['steps_per_s_wall']} steps/s ({m_status})",
              flush=True)

    report = {
        "what": "honest steps/s vs dispatch structure at the reference "
                "training workload (batch 16, 48 kHz, 192000-sample "
                "chunks, hidden 512, 64 harmonics, reverb, 6-scale loss) "
                "through the axon tunnel",
        "protocol": "per config: fresh warm child (compile into the "
                    "persistent XLA cache) then a fresh measured child of "
                    "probe_steps; steps/s = probe_steps / child process "
                    "wall-clock (import+cache upload+restore+train+tail "
                    "pull+save) — the only honest clock here (BASELINE.md "
                    "'the tunnel lies')",
        "probe_steps": args.probe_steps,
        "rows": rows,
        "total_wall_s": round(time.time() - t0, 1),
    }
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report["rows"], indent=2))
    print(f"[ceiling] wrote {args.out}")


if __name__ == "__main__":
    main()
