#!/usr/bin/env python
"""Tune the CREPE×YIN fusion weights (models/crepe.py:extract_pitch_hybrid)
on the robustness conditions (fixtures.DEGRADATIONS + pitch extremes).

Computes the expensive evidence once per file (CREPE salience + YIN CMNDF,
both on the 20-cent grid) and caches it, then sweeps (yin_weight,
switch_per_octave) through the cheap fused Viterbi decode, reporting
RPA@50c per condition against YIN alone and raw CREPE, so the shipped
defaults are chosen on measurements rather than vibes.

Usage: python scripts/tune_hybrid_pitch.py [--cache /tmp/hybrid_tune]
       [--n-validation 9] [--sweep "1,2,4,8x2,3"]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_cache(root, sample_rate, block_size, n_validation, params,
                capacity):
    """Per condition, per validation file: evidence + truth → .npz cache."""
    import numpy as np

    from ddsp_pytorch_tpu.data.fixtures import (
        DEGRADATIONS,
        frame_truth,
        make_degrader,
        make_oof_corpus,
    )
    from ddsp_pytorch_tpu.models.crepe import hybrid_evidence
    from ddsp_pytorch_tpu.ops import extract_pitch
    from ddsp_pytorch_tpu.utils.audio_io import load_wav

    conditions = [(tag, (45, 76), kw) for tag, kw in DEGRADATIONS.items()]
    conditions += [("extremes_clean", (36, 86), {}),
                   ("extremes_snr10_reverb", (36, 86),
                    dict(snr_db=10.0, rt60=0.3))]

    for tag, midi_range, kw in conditions:
        cond_dir = os.path.join(root, tag)
        done = os.path.join(cond_dir, "DONE")
        if os.path.exists(done):
            continue
        corpus = os.path.join(cond_dir, "corpus")
        degr = make_degrader(**kw) if kw else None
        make_oof_corpus(corpus, sample_rate=sample_rate, n_train=0,
                        n_validation=n_validation, midi_range=midi_range,
                        seed=0, degrade_fn=degr)
        meta = json.load(open(os.path.join(corpus, "truth", "meta.json")))
        for key in sorted(meta["files"]):
            part, stem = key.split("/")
            if part != "validation":
                continue
            sig, _ = load_wav(os.path.join(corpus, part, stem + ".wav"),
                              sample_rate)
            truth = np.load(os.path.join(corpus, "truth", part,
                                         stem + ".npz"))
            sal, d16, hop = hybrid_evidence(sig, sample_rate, block_size,
                                            params, capacity)
            n_out = len(sig) // block_size
            yin_f0 = np.asarray(extract_pitch(sig, sample_rate, block_size))
            f0f, vf = frame_truth(truth["f0"], truth["voiced"], block_size,
                                  n_out)
            np.savez(os.path.join(cond_dir, stem + ".npz"),
                     salience=np.asarray(sal), d16=np.asarray(d16),
                     hop=hop, n_out=n_out, yin_f0=yin_f0, f0f=f0f, vf=vf)
        open(done, "w").write("ok")
        print(f"[cache] {tag}", flush=True)


def rpa(est, f0f, vf):
    import numpy as np

    from ddsp_pytorch_tpu.data.fixtures import cents_error

    err = np.abs(cents_error(est[vf], f0f[vf]))
    return err <= 50.0  # per-frame hits


def sweep(root, sample_rate, block_size, combos):
    import numpy as np

    from ddsp_pytorch_tpu.models.crepe import (
        _interp_to_block_grid,
        cents_to_hz,
        decode_fused,
        viterbi_cents,
    )

    tags = sorted(
        d for d in os.listdir(root)
        if os.path.isdir(os.path.join(root, d))
    )
    table = {}
    for tag in tags:
        cond_dir = os.path.join(root, tag)
        files = sorted(f for f in os.listdir(cond_dir) if f.endswith(".npz"))
        hits = {"yin": [], "crepe": []}
        hits.update({label: [] for label, _ in combos})
        for f in files:
            z = np.load(os.path.join(cond_dir, f))
            sal, d16 = z["salience"], z["d16"]
            hop, n_out = int(z["hop"]), int(z["n_out"])
            f0f, vf = z["f0f"], z["vf"]
            hits["yin"].extend(rpa(z["yin_f0"], f0f, vf))
            crepe_f0 = np.asarray(_interp_to_block_grid(
                cents_to_hz(viterbi_cents(sal)), hop, n_out, block_size,
                sample_rate))
            hits["crepe"].extend(rpa(crepe_f0, f0f, vf))
            for label, kw in combos:
                est = np.asarray(_interp_to_block_grid(
                    decode_fused(sal, d16, **kw),
                    hop, n_out, block_size, sample_rate))
                hits[label].extend(rpa(est, f0f, vf))
        table[tag] = {k: float(np.mean(v)) for k, v in hits.items()}
        row = "  ".join(f"{k}={v:.3f}" for k, v in table[tag].items())
        print(f"[{tag}] {row}", flush=True)
    return table


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cache", default="/tmp/hybrid_tune")
    p.add_argument("--sample-rate", type=int, default=16000)
    p.add_argument("--block-size", type=int, default=256)
    p.add_argument("--n-validation", type=int, default=9)
    p.add_argument("--crepe", default="pretrained/crepe_tiny.msgpack")
    p.add_argument("--capacity", default="tiny")
    p.add_argument("--combos", default=None,
                   help="JSON list of [label, decode_fused-kwargs] pairs")
    p.add_argument("--out", default="/tmp/hybrid_tune/sweep.json")
    args = p.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    from flax import serialization

    params = serialization.msgpack_restore(open(args.crepe, "rb").read())
    os.makedirs(args.cache, exist_ok=True)
    build_cache(args.cache, args.sample_rate, args.block_size,
                args.n_validation, params, args.capacity)

    if args.combos:
        combos = [(label, kw) for label, kw in json.loads(args.combos)]
    else:
        # The default grid CONTAINS the shipped extract_pitch_hybrid
        # defaults (yin_weight=8, switch_per_octave=60, floor=0.03,
        # gate=2.0) so the selection is reproducible from this script
        # alone (round-4 advisor finding: the earlier grid could not
        # produce the shipped combination).  The switch_per_octave axis
        # spans the round-5 finding that a strong transition penalty is
        # the decisive lever for noisy note tails (10 → 60: snr10 row
        # 0.888 → 0.944).
        combos = [
            (f"y{w}_s{sw}_f{fl}_g{g}",
             dict(yin_weight=w, switch_per_octave=sw, salience_floor=fl,
                  confidence_gate=g))
            for w in (4.0, 8.0, 16.0)
            for sw in (10.0, 60.0, 100.0)
            for fl in (1e-6, 0.03)
            for g in (0.0, 2.0)
        ]
    table = sweep(args.cache, args.sample_rate, args.block_size, combos)
    with open(args.out, "w") as f:
        json.dump(table, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
