"""Data pipeline + config system tests."""

import os

import numpy as np
import pytest

from ddsp_pytorch_tpu.config import Config
from ddsp_pytorch_tpu.data import DataLoader, Dataset, dict_collate
from ddsp_pytorch_tpu.data.synthetic import make_synthetic_dataset


@pytest.fixture(scope="module")
def cache(tmp_path_factory):
    d = tmp_path_factory.mktemp("cache")
    make_synthetic_dataset(
        str(d), n_items=5, sample_rate=16000, signal_length=4096, block_size=128
    )
    return str(d)


def test_dataset_shapes(cache):
    ds = Dataset(os.path.join(cache, "train"))
    assert len(ds) == 5
    item = ds[0]
    assert item["sig"].shape == (4096,)
    assert item["pitch"].shape == (32, 1)
    assert item["loudness"].shape == (32, 1)
    assert item["mfcc"].shape == (32, 30)  # F+1 frames trimmed to F


def test_dict_collate(cache):
    ds = Dataset(os.path.join(cache, "train"))
    batch = dict_collate([ds[0], ds[1]])
    assert batch["sig"].shape == (2, 4096)
    assert batch["pitch"].shape == (2, 32, 1)


def test_loader_deterministic_per_epoch(cache):
    ds = Dataset(os.path.join(cache, "train"))
    dl = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=7)
    dl.set_epoch(3)
    a = [b["sig"].sum() for b in dl]
    dl2 = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=7)
    dl2.set_epoch(3)
    b = [x["sig"].sum() for x in dl2]
    np.testing.assert_allclose(a, b)
    dl2.set_epoch(4)
    c = [x["sig"].sum() for x in dl2]
    assert not np.allclose(a, c)  # different epoch → different order


def test_loader_host_sharding(cache):
    """Interleaved host shards partition the exact single-host epoch order
    (multi-host data loading, one loader per process)."""
    ds = Dataset(os.path.join(cache, "train"))
    full = DataLoader(ds, batch_size=1, shuffle=True, seed=3)
    full.set_epoch(2)
    global_order = [float(b["sig"].sum()) for b in full]

    sharded = []
    for shard in range(2):
        dl = DataLoader(
            ds, batch_size=1, shuffle=True, seed=3, num_shards=2,
            shard_index=shard,
        )
        dl.set_epoch(2)
        sharded.append([float(b["sig"].sum()) for b in dl])
    assert len(sharded[0]) == len(sharded[1])  # lockstep
    # interleaved reconstruction matches the global order prefix
    recon = [x for pair in zip(sharded[0], sharded[1]) for x in pair]
    np.testing.assert_allclose(recon, global_order[: len(recon)])


def test_loader_drop_last(cache):
    ds = Dataset(os.path.join(cache, "train"))
    assert len(DataLoader(ds, batch_size=2, drop_last=True)) == 2
    assert len(DataLoader(ds, batch_size=2, drop_last=False)) == 3


def test_device_loader_matches_host_loader(cache):
    """DeviceDataLoader yields the same batches (same (seed, epoch) order)
    as the host loader — on device."""
    from ddsp_pytorch_tpu.data import DeviceDataLoader

    ds = Dataset(os.path.join(cache, "train"))
    host = DataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=5)
    dev = DeviceDataLoader(ds, batch_size=2, shuffle=True, drop_last=True, seed=5)
    host.set_epoch(1)
    dev.set_epoch(1)
    assert len(host) == len(dev)
    for hb, db in zip(host, dev):
        for k in hb:
            np.testing.assert_allclose(np.asarray(db[k]), hb[k], rtol=1e-6)


def test_synthetic_pitch_is_ground_truth(cache):
    """The stored pitch must match what a tracker would recover — i.e. the
    audio really is a harmonic tone at the stored f0."""
    from ddsp_pytorch_tpu.ops import extract_pitch

    ds = Dataset(os.path.join(cache, "validation"))
    item = ds[0]
    tracked = np.asarray(extract_pitch(item["sig"], 16000, 128))
    stored = item["pitch"][:, 0]
    mid = slice(4, -4)
    np.testing.assert_allclose(tracked[mid], stored[mid], rtol=0.03)


# ------------------------------------------------------------------ config


def test_config_roundtrip(tmp_path):
    cfg = Config()
    cfg.data.mean_loudness = -4.2
    p = os.path.join(tmp_path, "c.yaml")
    cfg.to_yaml(p)
    back = Config.from_yaml(p)
    assert back.data.mean_loudness == -4.2
    assert back.model.kwargs["hidden_size"] == 512
    assert back.train.scales == [4096, 2048, 1024, 512, 256, 128]


def test_config_loads_reference_style_yaml(tmp_path):
    """A config written for the reference (same sections/keys) loads as-is."""
    raw = """
data:
  data_location: "./data/violin"
  extension: "wav"
preprocess:
  sample_rate: 48000
  signal_length: 192000
  block_size: 512
  oneshot: false
  out_dir: "./cache/violin"
model:
  name: single-inst-decoder
  kwargs:
    hidden_size: 512
    n_harmonic: 64
    n_bands: 65
    sample_rate: 48000
    block_size: 512
    has_reverb: True
train:
  scales: [4096, 2048, 1024, 512, 256, 128]
  overlap: .75
  batch: 16
  lr: 1.0e-3
  steps: 500000
"""
    p = os.path.join(tmp_path, "ref.yaml")
    with open(p, "w") as f:
        f.write(raw)
    cfg = Config.from_yaml(p)
    assert cfg.model.name == "single-inst-decoder"
    assert cfg.preprocess.block_size == 512
    assert cfg.train.overlap == 0.75
    assert cfg.n_frames == 375


def test_config_apply_overrides():
    """Any-key dotted-path CLI overrides (parity: the reference's
    effortless_config lets any config field be overridden from the command
    line, reference train.py:19-28)."""
    import pytest

    cfg = Config()
    cfg.apply_overrides([
        "train.lr=3e-4",
        "model.kwargs.hidden_size=256",
        "preprocess.pitch_tracker=crepe",
        "train.scales=[512, 256]",
        "train.grad_clip_norm=1.0",
        "mesh.time=4",
    ])
    assert cfg.train.lr == 3e-4  # YAML-parsed float, not the string
    assert cfg.model.kwargs["hidden_size"] == 256
    assert cfg.preprocess.pitch_tracker == "crepe"
    assert cfg.train.scales == [512, 256]
    assert cfg.train.grad_clip_norm == 1.0
    assert cfg.mesh.time == 4
    with pytest.raises(ValueError, match="valid here"):
        cfg.apply_overrides(["train.no_such_field=1"])
    with pytest.raises(ValueError, match="key.path=value"):
        cfg.apply_overrides(["train.lr"])


def test_train_cli_set_override_lands_in_frozen_config(tmp_path):
    """`train.py --set train.lr=...` must reach the run's frozen
    config.yaml (the artifact resume/export read)."""
    import subprocess
    import sys

    from ddsp_pytorch_tpu.data import make_synthetic_dataset

    cache = os.path.join(tmp_path, "cache")
    make_synthetic_dataset(cache, n_items=2, sample_rate=16000,
                           signal_length=8192, block_size=256, n_harmonic=8)
    cfg = Config.from_dict({
        "preprocess": {"sample_rate": 16000, "signal_length": 8192,
                       "block_size": 256, "out_dir": cache},
        "model": {"name": "single-inst-decoder",
                  "kwargs": {"hidden_size": 16, "n_harmonic": 8,
                             "n_bands": 9, "sample_rate": 16000,
                             "block_size": 256, "has_reverb": False,
                             "use_pallas": "never"}},
        "train": {"scales": [256], "batch": 2, "steps": 1,
                  "checkpoint_every_steps": 1},
    })
    cfg_path = os.path.join(tmp_path, "c.yaml")
    cfg.to_yaml(cfg_path)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "train.py"),
         "--config", cfg_path, "--root", str(tmp_path), "--name", "ovr",
         "--platform", "cpu", "--no-mesh",
         "--set", "train.lr=2.5e-4",
         "--set", "train.metrics_flush_steps=1"],
        capture_output=True, text=True, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    frozen = Config.from_yaml(os.path.join(tmp_path, "ovr", "config.yaml"))
    assert frozen.train.lr == 2.5e-4
    assert frozen.train.metrics_flush_steps == 1


def test_sigmund_ingestion(tmp_path):
    """3-channel wav → npy cache (reference preprocess_from_sigmund.py)."""
    from scipy.io import wavfile

    from ddsp_pytorch_tpu.data.sigmund import preprocess_from_sigmund

    sr, n = 16000, 8192
    t = np.arange(n) / sr
    audio = np.sin(2 * np.pi * 220 * t).astype(np.float32)
    pitch = np.full(n, 220.0, np.float32)
    loud = np.full(n, -3.0, np.float32)
    wav = np.stack([audio, pitch, loud], axis=1)
    wavfile.write(os.path.join(tmp_path, "sig.wav"), sr, wav)

    cfg = Config.from_dict(
        {
            "preprocess": {
                "sample_rate": sr,
                "signal_length": 4096,
                "block_size": 128,
                "out_dir": str(tmp_path / "out"),
            }
        }
    )
    preprocess_from_sigmund(os.path.join(tmp_path, "sig.wav"), cfg, "train")
    sigs = np.load(tmp_path / "out" / "train" / "signals.npy")
    pitchs = np.load(tmp_path / "out" / "train" / "pitchs.npy")
    assert sigs.shape == (2, 4096)
    assert pitchs.shape == (2, 32)
    np.testing.assert_allclose(pitchs, 220.0, atol=1e-3)


def test_nsynth_split(tmp_path):
    import json

    from ddsp_pytorch_tpu.data.nsynth import create_inst_view

    pdir = tmp_path / "nsynth-train"
    (pdir / "audio").mkdir(parents=True)
    examples = {
        "violin_A_001": {"instrument_str": "violin_acoustic_001"},
        "flute_A_001": {"instrument_str": "flute_acoustic_001"},
    }
    with open(pdir / "examples.json", "w") as f:
        json.dump(examples, f)
    for nid in examples:
        (pdir / "audio" / f"{nid}.wav").write_bytes(b"RIFF")

    counts = create_inst_view(tmp_path, tmp_path / "view", "violin")
    assert counts == {"train": 1}
    assert (tmp_path / "view" / "train" / "violin" / "violin_A_001.wav").exists()


def test_instrument_presets(tmp_path):
    """Instrument presets render finite, bounded, f32 notes with vibrato
    (pitch varies) and a normalized harmonic recipe (synthetic pretrained
    corpus — reference ships pretrained sax/violin, README.md:46-49)."""
    from ddsp_pytorch_tpu.data.synthetic import INSTRUMENTS

    assert set(INSTRUMENTS) >= {"tone", "violin", "sax", "flute"}
    out = make_synthetic_dataset(
        str(tmp_path), n_items=2, sample_rate=16000, signal_length=8192,
        block_size=256, n_harmonic=12, instrument="sax", seed=11,
        partitions=("train",),
    )
    sig, pitch = out["signals"], out["pitchs"]
    assert sig.dtype == np.float32 and pitch.dtype == np.float32
    assert np.all(np.isfinite(sig)) and np.abs(sig).max() < 1.5
    lo, hi = INSTRUMENTS["sax"]["f0"]
    assert pitch.min() > lo * 0.9 and pitch.max() < hi * 1.1
    # vibrato: every note's pitch track actually moves
    assert (pitch.max(axis=1) - pitch.min(axis=1)).min() > 0.1
