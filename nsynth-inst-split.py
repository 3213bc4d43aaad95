#!/usr/bin/env python
"""NSynth instrument-split CLI (parity: reference nsynth-inst-split.py).

Builds a per-instrument symlink view over the NSynth partitions so the
preprocessing pipeline can consume a single instrument folder:

    python nsynth-inst-split.py --nsynth-root /data/nsynth \\
        --target /data/views --instrument violin

expects /data/nsynth/nsynth-{valid,test,train}/{audio/, examples.json}.
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--nsynth-root", required=True)
    p.add_argument("--target", required=True)
    p.add_argument("--instrument", required=True,
                   help="substring matched against instrument_str, e.g. 'violin'")
    p.add_argument("--partitions", nargs="*", default=["valid", "test", "train"])
    args = p.parse_args()

    from ddsp_pytorch_tpu.data.nsynth import create_inst_view

    counts = create_inst_view(
        args.nsynth_root, args.target, args.instrument, partitions=args.partitions
    )
    for partition, n in counts.items():
        print(f"{partition}: {n} files linked")


if __name__ == "__main__":
    main()
