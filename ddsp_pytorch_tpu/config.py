"""Typed configuration system.

The reference threads a raw YAML dict with ``data`` / ``preprocess`` /
``model`` / ``train`` sections through every layer (reference config.yaml:1-28,
train.py:27-28) and mutates it at runtime (loudness stats injected at
train.py:53-55).  Here the same YAML section structure is kept — configs
written for the reference load unchanged — but behind frozen-ish dataclasses
with explicit fields, plus a new ``mesh`` section for the TPU parallelism
layer the reference does not have.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import yaml


@dataclass
class DataConfig:
    """Reference config.yaml:1-3 (`data:` section)."""

    data_location: str = "./data"
    extension: str = "wav"
    # Dataset loudness statistics.  The reference injects these into the
    # config dict at train time (train.py:53-55) so export can bake them into
    # the deployed model (export.py:29-30); here they are first-class fields.
    mean_loudness: Optional[float] = None
    std_loudness: Optional[float] = None


@dataclass
class PreprocessConfig:
    """Reference config.yaml:5-11 (`preprocess:` section)."""

    sample_rate: int = 48000
    signal_length: int = 192000
    block_size: int = 512
    oneshot: bool = False
    out_dir: str = "./cache"
    # Feature-extraction knobs that were hard-coded in the reference
    # (preprocess.py:30-32: n_mfcc=30, n_fft=1024, fmin=20, fmax=8000,
    # n_mels=128; core.py:81: loudness n_fft=2048).
    n_mfcc: int = 30
    mfcc_n_fft: int = 1024
    mfcc_fmin: float = 20.0
    mfcc_fmax: float = 8000.0
    n_mels: int = 128
    # Fixed dB reference for the MFCC log floor (None → librosa's per-chunk
    # global-max reference, matching the reference exactly).  Set a value
    # (e.g. 0.0) to make train-time MFCCs identical to what the causal
    # streaming extractor (streaming/mfcc.py StreamingMFCC) computes live —
    # required for exact train/stream agreement of the mfcc-autoencoder's
    # realtime path.  Frozen into exported bundles.
    mfcc_ref_db: Optional[float] = None
    loudness_n_fft: int = 2048
    # Pitch tracker configuration (the reference shells out to CREPE,
    # core.py:100-119; we ship a JAX YIN+Viterbi tracker, ops/pitch.py, and
    # a from-scratch-trainable CREPE-architecture convnet, models/crepe.py).
    # Pitch search range in Hz — honored by EVERY tracker: yin's candidate
    # grid, hybrid's YIN-evidence grid, and a salience mask for crepe
    # (make_pitch_fn → models/crepe.py).
    pitch_fmin: float = 50.0
    pitch_fmax: float = 2000.0
    # "hybrid" (default: CREPE×YIN joint Viterbi, ≥ either parent on all
    # nine robustness rows — pretrained/pitch_robustness.json) | "yin"
    # (classical, no learned weights) | "crepe" (neural alone).
    pitch_tracker: str = "hybrid"
    # scripts/train_crepe.py bundle; None → the shipped
    # pretrained/crepe_tiny.msgpack (resolved by data/preprocess.py
    # make_pitch_fn).  Only consulted for the crepe/hybrid trackers.
    crepe_params: Optional[str] = None
    crepe_capacity: str = "tiny"


@dataclass
class ModelConfig:
    """Reference config.yaml:13-21 (`model:` section): registry name + kwargs."""

    name: str = "single-inst-decoder"
    kwargs: Dict[str, Any] = field(
        default_factory=lambda: {
            "hidden_size": 512,
            "n_harmonic": 64,
            "n_bands": 65,
            "sample_rate": 48000,
            "block_size": 512,
            "has_reverb": True,
        }
    )


@dataclass
class TrainConfig:
    """Reference config.yaml:23-28 (`train:` section) + TPU-era additions."""

    scales: List[int] = field(default_factory=lambda: [4096, 2048, 1024, 512, 256, 128])
    overlap: float = 0.75
    batch: int = 16
    lr: float = 1.0e-3
    steps: int = 500000
    # "adam" (reference train.py:62) or "sgd" (plain optax.sgd — useful for
    # numerics work: the param delta is exactly -lr*grad, which Adam's
    # m/sqrt(v) normalization is not).
    optimizer: str = "adam"
    # New fields (absent in the reference; defaults preserve its behavior).
    seed: int = 0
    val_interval_epochs: int = 10  # reference train.py:17
    log_interval_epochs: int = 1  # reference train.py:16
    checkpoint_every_steps: int = 2000
    keep_checkpoints: int = 3
    # Scalars are buffered on device and fetched in batches every N steps:
    # one device→host sync per N steps instead of per step (a per-step
    # scalar pull stalls the dispatch pipeline; on remote-tunneled chips it
    # dominates wall clock).  1 = reference behavior (pull every step).
    metrics_flush_steps: int = 20
    # (train.use_bf16 was deleted in round 5: measured strictly slower at
    # the reference's 512-hidden shapes — docs/kernels.md "bf16 verdict".
    # NN compute dtype remains settable per model via model.kwargs.dtype;
    # DSP synthesis stays f32 regardless — SURVEY.md §7 hard part #2.)
    grad_clip_norm: Optional[float] = None
    # Linear LR decay: lr → lr_stop over lr_decay_steps, then constant.
    # The reference ships this schedule (utils.py:5-14) but never applies it
    # (SURVEY.md §2.8.6); here it is wired in when lr_stop is set.
    lr_stop: Optional[float] = None
    lr_decay_steps: Optional[int] = None
    # Optimizer steps executed per device dispatch: N batches are stacked
    # into one super-batch and lax.scan runs N train steps in a single
    # compiled call.  At the reference workload the per-step wall clock is
    # dispatch-bound (BASELINE.md ablation), so N > 1 amortizes the host
    # round-trip; results are bit-identical to N single steps (the scan body
    # IS the single-step function).  1 = reference behavior.
    steps_per_call: int = 1
    # Unroll factor for the steps_per_call lax.scan: U step bodies per
    # while-loop iteration (must divide steps_per_call).  On a locally
    # attached chip this is a latency micro-knob; through the axon tunnel
    # the round-5 ceiling probe (scripts/ceiling_probe.py) measures whether
    # the container's ~0.2-0.3 s per-iteration overhead is charged per
    # while-loop iteration (unroll helps ~U×) or per optimizer step (it
    # does not).  1 = plain scan.
    scan_unroll: int = 1


@dataclass
class MeshConfig:
    """TPU parallelism section (no reference analogue — SURVEY.md §2.7).

    ``data`` × ``time`` device mesh: the batch/voice axis is sharded over
    ``data``; the sample/time axis of long audio can be sharded over ``time``
    (halo-exchange convolutions + distributed phase scan, parallel/ops.py).
    Values of -1 mean "use all remaining devices".
    """

    data: int = -1
    time: int = 1


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)

    # ------------------------------------------------------------------ io
    @classmethod
    def from_dict(cls, raw: Dict[str, Any]) -> "Config":
        """Build from a raw (reference-style) YAML dict; unknown keys in each
        section are ignored so reference configs load as-is."""

        def build(dc_cls, section):
            if section is None:
                return dc_cls()
            names = {f.name for f in dataclasses.fields(dc_cls)}
            return dc_cls(**{k: v for k, v in section.items() if k in names})

        return cls(
            data=build(DataConfig, raw.get("data")),
            preprocess=build(PreprocessConfig, raw.get("preprocess")),
            model=build(ModelConfig, raw.get("model")),
            train=build(TrainConfig, raw.get("train")),
            mesh=build(MeshConfig, raw.get("mesh")),
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    @classmethod
    def from_yaml(cls, path: str) -> "Config":
        with open(path, "r") as f:
            raw = yaml.safe_load(f)
        return cls.from_dict(raw or {})

    def to_yaml(self, path: str) -> None:
        with open(path, "w") as f:
            yaml.safe_dump(self.to_dict(), f)

    # ------------------------------------------------------- CLI overrides
    def apply_overrides(self, overrides: List[str]) -> "Config":
        """Override any config field from ``key.path=value`` strings.

        Parity with the reference's ``effortless_config`` ergonomics
        (reference train.py:19-28: any config field overridable from the
        command line).  The path is dotted through the section dataclasses
        and into plain dicts (``model.kwargs.hidden_size=256``); the value
        is YAML-parsed (so ``1e-4``, ``true``, ``[512,256]`` and quoted
        strings all work).  Mutates and returns self.  Unknown paths raise
        with the list of valid keys at the failing level.
        """
        for item in overrides:
            if "=" not in item:
                raise ValueError(
                    f"--set expects key.path=value, got {item!r}"
                )
            path, _, raw_val = item.partition("=")
            value = yaml.safe_load(raw_val) if raw_val != "" else None
            if isinstance(value, str):
                # YAML 1.1 only floats exponents with a dot ('3.0e-4');
                # accept the plain scientific form users actually type.
                try:
                    value = float(value)
                except ValueError:
                    pass
            keys = path.strip().split(".")
            target: Any = self
            for i, key in enumerate(keys[:-1]):
                if isinstance(target, dict):
                    target = target.setdefault(key, {})
                elif dataclasses.is_dataclass(target) and key in {
                    f.name for f in dataclasses.fields(target)
                }:
                    target = getattr(target, key)
                else:
                    valid = (
                        sorted(target)
                        if isinstance(target, dict)
                        else sorted(
                            f.name for f in dataclasses.fields(target)
                        )
                    )
                    raise ValueError(
                        f"--set {path}: no key {'.'.join(keys[:i + 1])!r}; "
                        f"valid here: {valid}"
                    )
            leaf = keys[-1]
            if isinstance(target, dict):
                target[leaf] = value
            elif dataclasses.is_dataclass(target) and leaf in {
                f.name for f in dataclasses.fields(target)
            }:
                setattr(target, leaf, value)
            else:
                valid = sorted(f.name for f in dataclasses.fields(target))
                raise ValueError(
                    f"--set {path}: no field {leaf!r}; valid here: {valid}"
                )
        return self

    # ------------------------------------------------------------- helpers
    @property
    def n_frames(self) -> int:
        return self.preprocess.signal_length // self.preprocess.block_size

    def replace(self, **kwargs) -> "Config":
        return dataclasses.replace(self, **kwargs)
