"""Shared reference-workload config for the on-chip train/bench scripts.

The reference training workload (/root/reference/config.yaml:5-28 —
batch 16, 48 kHz, 192 000-sample chunks, hidden 512, 64 harmonics,
65 bands, reverb, 6-scale 0.75-overlap loss, lr 1e-3) plus the
pull-free-segment knobs (metrics flush / checkpoint / validation / media
deferred to segment tails — BASELINE.md "The tunnel lies").  One source
of truth so ceiling_probe.py, trainrun_tpu.py and train_sigmund.py
measure the SAME workload; a knob tweak lands in every script at once.
"""

import os


def reference_workload_config(
    data_location: str,
    out_dir: str,
    preprocess: dict | None = None,
    train: dict | None = None,
) -> dict:
    """Config dict for Config.from_dict / yaml.safe_dump.

    `preprocess` / `train` entries override the workload section they
    name (e.g. train={"steps": 20000, "steps_per_call": 50}).
    """
    cfg = {
        "data": {"data_location": data_location},
        "preprocess": {
            "sample_rate": 48000,
            "signal_length": 192000,
            "block_size": 512,
            "out_dir": out_dir,
        },
        "model": {
            "name": "single-inst-decoder",
            "kwargs": {
                "hidden_size": 512,
                "n_harmonic": 64,
                "n_bands": 65,
                "sample_rate": 48000,
                "block_size": 512,
                "has_reverb": True,
            },
        },
        "train": {
            "scales": [4096, 2048, 1024, 512, 256, 128],
            "overlap": 0.75,
            "batch": 16,
            "lr": 1.0e-3,
            "steps": 10**9,
            # pull-free segments: metrics flush + checkpoint only at the
            # segment tail; no mid-run validation/media (each would pull
            # device data and poison the process — BASELINE.md)
            "metrics_flush_steps": 1000000000,
            "checkpoint_every_steps": 0,
            "val_interval_epochs": 0,
            "log_interval_epochs": 0,
            "keep_checkpoints": 2,
        },
    }
    cfg["preprocess"].update(preprocess or {})
    cfg["train"].update(train or {})
    return cfg


def write_workload_yaml(path: str, **kwargs) -> str:
    import yaml

    cfg = reference_workload_config(**kwargs)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(cfg, f)
    return path
