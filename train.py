#!/usr/bin/env python
"""Training CLI.

Parity: reference train.py — ``python train.py --config configs/config.yaml
--name myrun [--root runs] [--steps N]``.  Loads the YAML config, builds the
model by registry name, computes dataset loudness stats, and runs the
Trainer (jitted train step; data-parallel over all visible devices unless
--mesh-data/--mesh-time say otherwise).  Resumes automatically from the
latest checkpoint in the run directory.
"""

import argparse
from os import path


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--name", default="debug")
    p.add_argument("--root", default="runs")
    p.add_argument("--steps", type=int, default=None, help="override train.steps")
    p.add_argument("--batch", type=int, default=None, help="override train.batch")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument(
        "--steps-per-call",
        type=int,
        default=None,
        help="optimizer steps per device dispatch (lax.scan over stacked "
        "batches; amortizes the dispatch-bound step — see BASELINE.md)",
    )
    p.add_argument(
        "--mesh-data", type=int, default=None,
        help="mesh 'data' axis size (default: config.mesh.data; -1 = all "
        "remaining devices)",
    )
    p.add_argument(
        "--mesh-time", type=int, default=None,
        help="mesh 'time' axis size (default: config.mesh.time); >1 runs "
        "the time-sharded train step (training/time_sharded.py)",
    )
    p.add_argument("--no-mesh", action="store_true", help="single-device jit")
    p.add_argument(
        "--platform",
        default=None,
        help="force a JAX platform (e.g. cpu); overrides environment defaults",
    )
    p.add_argument(
        "--device-cache",
        action="store_true",
        help="upload the whole feature cache to the accelerator once and "
        "batch by on-device indexing (removes per-step host transfer; "
        "single-host, dataset must fit HBM)",
    )
    p.add_argument(
        "--multihost",
        action="store_true",
        help="call jax.distributed.initialize() (coordinator from env: "
        "JAX_COORDINATOR_ADDRESS etc.) before building the mesh",
    )
    p.add_argument(
        "--profile",
        action="store_true",
        help="capture a jax.profiler trace of the first ~30 steps to "
        "<run_dir>/trace (view in XProf/TensorBoard)",
    )
    p.add_argument(
        "--set",
        action="append",
        default=[],
        metavar="KEY.PATH=VALUE",
        dest="overrides",
        help="override any config field (dotted path, YAML-parsed value; "
        "repeatable), e.g. --set train.lr=3e-4 "
        "--set model.kwargs.hidden_size=256 — parity with the reference's "
        "effortless_config CLI (reference train.py:19-28)",
    )
    p.add_argument(
        "--segment-steps",
        type=int,
        default=None,
        help="run training as a sequence of fresh child processes of this "
        "many steps each (exact checkpoint resume stitches them).  For "
        "remote-tunneled chips where the first device->host pull (metrics "
        "flush, checkpoint) permanently degrades the process's session "
        "~130x (BASELINE.md 'degraded windows, explained'); each segment "
        "pays the poisoning only for its own tail.  Locally-attached "
        "chips don't need this.",
    )
    p.add_argument(
        "--segment-schedule",
        default=None,
        metavar="N1,N2,...",
        help="like --segment-steps but with per-segment sizes (comma "
        "list; the last size repeats until train.steps).  Doubles as the "
        "round-5 segment-size ceiling search: each segment is one fresh "
        "process whose wall-clock lands in segments.jsonl, so an "
        "escalating schedule measures steps/s vs segment size while the "
        "run trains (CEILING_r05.json / BASELINE.md).",
    )
    args = p.parse_args()

    if args.segment_steps is not None or args.segment_schedule is not None:
        return _run_segmented(args)

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    # Persistent XLA compilation cache: a --segment-steps run pays the
    # full-model TPU compile (~60-90 s) only in its FIRST child process;
    # every later segment (and every re-run at the same shapes) hits disk.
    jax.config.update(
        "jax_compilation_cache_dir",
        path.expanduser("~/.cache/ddsp_tpu_xla_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.multihost:
        jax.distributed.initialize()

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.data import Datamodule
    from ddsp_pytorch_tpu.training import Trainer

    config = Config.from_yaml(args.config)
    config.apply_overrides(args.overrides)
    if args.steps is not None:
        config.train.steps = args.steps
    if args.batch is not None:
        config.train.batch = args.batch
    if args.lr is not None:
        config.train.lr = args.lr
    if args.steps_per_call is not None:
        config.train.steps_per_call = args.steps_per_call

    # CLI overrides config.mesh; config.mesh is the durable home
    # (configs/*.yaml `mesh:` section).
    if args.mesh_data is not None:
        config.mesh.data = args.mesh_data
    if args.mesh_time is not None:
        config.mesh.time = args.mesh_time

    mesh = None
    if not args.no_mesh:
        import jax

        if len(jax.devices()) > 1:
            from ddsp_pytorch_tpu.parallel import make_mesh

            mesh = make_mesh(data=config.mesh.data, time=config.mesh.time)

    run_dir = path.join(args.root, args.name)
    dm = Datamodule(config, device_cache=args.device_cache)
    dm.setup()

    trainer = Trainer(config, run_dir, mesh=mesh)
    try:
        if args.profile:
            from os import path as _p

            from ddsp_pytorch_tpu.training.profiling import trace

            steps = min(30, config.train.steps)
            with trace(_p.join(run_dir, "trace")):
                trainer.fit(dm, total_steps=steps)
        trainer.fit(dm)
    finally:
        trainer.close()


def _run_segmented(args) -> None:
    """Spawn child `train.py` invocations of --segment-steps each (fresh
    process = fresh tunnel session), up to the configured total steps.

    The first child is a stats-priming run (--steps 0): it computes the
    dataset loudness stats, freezes them into the run config and saves the
    step-0 checkpoint — so its device→host pulls poison a throwaway
    process, and every TRAINING segment resumes with frozen stats and
    stays pull-free until its own tail (BASELINE.md 'degraded windows').
    Per-segment wall-clock is appended to <run_dir>/segments.jsonl.
    """
    import json
    import subprocess
    import sys
    import time

    from ddsp_pytorch_tpu.config import Config

    config = Config.from_yaml(args.config)
    config.apply_overrides(args.overrides)
    total = args.steps if args.steps is not None else config.train.steps
    if args.segment_schedule is not None:
        schedule = [int(s) for s in args.segment_schedule.split(",") if s]
        if not schedule or any(s <= 0 for s in schedule):
            sys.exit(
                f"--segment-schedule needs positive sizes, got "
                f"{args.segment_schedule!r}"
            )
    else:
        seg = args.segment_steps
        if seg <= 0:
            sys.exit(f"--segment-steps must be positive, got {seg}")
        schedule = [seg]
    base = [a for a in sys.argv[1:]]
    # strip the segmentation args and any --steps override; each child
    # gets its own --steps boundary
    cleaned = []
    skip = 0
    for a in base:
        if skip:
            skip -= 1
            continue
        if a in ("--segment-steps", "--segment-schedule", "--steps"):
            skip = 1
            continue
        if a.startswith(
            ("--segment-steps=", "--segment-schedule=", "--steps=")
        ):
            continue
        cleaned.append(a)

    run_dir = path.join(args.root, args.name)
    seg_log = path.join(run_dir, "segments.jsonl")

    def child(boundary, label):
        cmd = [sys.executable, __file__, *cleaned, "--steps", str(boundary)]
        print(f"[segment] {label} -> step {boundary}/{total}", flush=True)
        t0 = time.time()
        rc = subprocess.run(cmd).returncode
        dt = time.time() - t0
        from os import makedirs

        makedirs(run_dir, exist_ok=True)
        with open(seg_log, "a") as f:
            f.write(json.dumps({
                "label": label, "to_step": boundary, "total": total,
                "wall_s": round(dt, 3), "returncode": rc,
            }) + "\n")
        if rc != 0:
            sys.exit(rc)

    child(0, "prime-stats")
    boundary = 0
    i = 0
    while boundary < total:
        seg = schedule[min(i, len(schedule) - 1)]
        boundary = min(boundary + seg, total)
        child(boundary, "train")
        i += 1


if __name__ == "__main__":
    main()
