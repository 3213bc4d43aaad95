#!/usr/bin/env bash
# End-to-end CLI smoke test: shells the ACTUAL user-facing drivers in
# sequence on a tiny generated corpus, asserting each exits 0 and leaves
# its artifacts behind.  This covers the arg wiring of the five CLIs — the
# reference's user journey (README: preprocess → train → export → realtime)
# — which unit tests exercise only through library calls.
#
#   wav corpus → preprocess.py → train.py → export.py → transfer.py
#             → performance.py --bundle
#
# Runs on CPU (--platform cpu) in ~2-3 min.  Usage: scripts/e2e_smoke.sh
set -euo pipefail
cd "$(dirname "$0")/.."

TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
echo "== e2e smoke in $TMP"

echo "== 0/5 generate a tiny wav corpus + config"
python - "$TMP" <<'PY'
import os, sys
import numpy as np

tmp = sys.argv[1]
sr, seconds = 16000, 2.0
rng = np.random.default_rng(0)
from ddsp_pytorch_tpu.utils.audio_io import save_wav

for part, count in (("train", 3), ("validation", 1)):
    d = os.path.join(tmp, "corpus", part)
    os.makedirs(d)
    for i in range(count):
        t = np.arange(int(sr * seconds)) / sr
        f0 = 200.0 + 40.0 * i + 6.0 * np.sin(2 * np.pi * 2.5 * t)  # vibrato
        phase = 2 * np.pi * np.cumsum(f0) / sr
        x = np.zeros_like(t)
        for k, a in enumerate([0.5, 0.25, 0.12, 0.08], start=1):
            x += a * np.sin(k * phase)
        env = np.minimum(1.0, t * 8) * np.exp(-t * 0.4)
        x = (x * env + 0.01 * rng.standard_normal(t.size)).astype(np.float32)
        save_wav(os.path.join(d, f"tone{i}.wav"), 0.5 * x, sr)

cfg = f"""
data:
  data_location: {tmp}/corpus
  extension: wav
preprocess:
  sample_rate: {sr}
  signal_length: 16384
  block_size: 256
  out_dir: {tmp}/cache
model:
  name: single-inst-decoder
  kwargs:
    hidden_size: 64
    n_harmonic: 8
    n_bands: 17
    sample_rate: {sr}
    block_size: 256
    has_reverb: true
    use_pallas: never
train:
  scales: [512, 256]
  overlap: 0.75
  batch: 2
  steps: 20
  lr: 1.0e-3
"""
with open(os.path.join(tmp, "config.yaml"), "w") as f:
    f.write(cfg)
PY

echo "== 1/5 preprocess.py"
python preprocess.py --config "$TMP/config.yaml" --platform cpu
test -f "$TMP/cache/train/signals.npy"
test -f "$TMP/cache/validation/signals.npy"

echo "== 2/5 train.py"
python train.py --config "$TMP/config.yaml" --name smoke --root "$TMP/runs" \
  --platform cpu --no-mesh
test -f "$TMP/runs/smoke/config.yaml"
test -d "$TMP/runs/smoke/best"

echo "== 3/5 export.py"
python export.py --run "$TMP/runs/smoke" --out-dir "$TMP/export" --platform cpu
BUNDLE=$(ls -d "$TMP"/export/*_bundle)
test -f "$BUNDLE/params.msgpack"
test -f "$BUNDLE/meta.json"
ls "$TMP"/export/*_impulse.wav >/dev/null

echo "== 4/5 transfer.py (timbre transfer onto the validation wav)"
python transfer.py --bundle "$BUNDLE" \
  --input "$TMP/corpus/validation/tone0.wav" --output "$TMP/transfer.wav" \
  --platform cpu
test -s "$TMP/transfer.wav"

echo "== 5/5 performance.py --bundle"
python performance.py --bundle "$BUNDLE" --n-run 2 --platform cpu

echo "e2e smoke: all green"
