"""NSynth dataset utilities: filter by instrument, build per-instrument views.

Parity: reference nsynth-inst-split.py:21-105 — parse examples.json, filter
notes by instrument string, and create a symlink tree
``target/partition/instrument/*.wav`` over the NSynth partitions so the
preprocessing pipeline can consume a single instrument folder.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict, List

PARTITIONS = ("valid", "test", "train")


def load_examples(nsynth_partition_dir) -> Dict[str, dict]:
    """Parse examples.json of one NSynth partition directory."""
    with open(Path(nsynth_partition_dir) / "examples.json") as f:
        return json.load(f)


def filter_by_instrument(examples: Dict[str, dict], instrument_str: str) -> List[str]:
    """Note ids whose instrument_str contains the query (e.g. 'violin')."""
    return [
        note_id
        for note_id, meta in examples.items()
        if instrument_str in meta.get("instrument_str", note_id)
    ]


def create_inst_view(
    nsynth_root,
    target,
    instrument_str: str,
    partitions=PARTITIONS,
    audio_subdir: str = "audio",
) -> Dict[str, int]:
    """Symlink matching wavs into target/partition/instrument/.

    Returns {partition: n_files}.  NSynth partition dirs are expected as
    nsynth_root/nsynth-{partition}/ with audio/ and examples.json inside.
    """
    nsynth_root = Path(nsynth_root)
    target = Path(target)
    counts = {}
    for partition in partitions:
        pdir = nsynth_root / f"nsynth-{partition}"
        if not pdir.exists():
            continue
        examples = load_examples(pdir)
        ids = filter_by_instrument(examples, instrument_str)
        out_dir = target / partition / instrument_str
        os.makedirs(out_dir, exist_ok=True)
        n = 0
        for note_id in ids:
            src = pdir / audio_subdir / f"{note_id}.wav"
            dst = out_dir / f"{note_id}.wav"
            if src.exists() and not dst.exists():
                os.symlink(src.resolve(), dst)
                n += 1
        counts[partition] = n
    return counts
