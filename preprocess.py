#!/usr/bin/env python
"""Preprocessing CLI (parity: reference ddsp/preprocess.py main).

``python preprocess.py --config configs/config.yaml`` processes the
``train`` and ``validation`` partitions under data.data_location into the
.npy feature cache at preprocess.out_dir.

``--from-sigmund file.wav`` instead ingests a Pd-recorded 3-channel wav
(audio/pitch/loudness — reference preprocess_from_sigmund.py).
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--config", default="configs/config.yaml")
    p.add_argument("--from-sigmund", default=None, metavar="WAV")
    p.add_argument("--partition", default=None,
                   help="process only this partition (default: train and "
                        "validation)")
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY.PATH=VALUE",
                   help="override any config field (dotted path, "
                        "YAML-parsed value; repeatable)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ddsp_pytorch_tpu.config import Config

    config = Config.from_yaml(args.config)
    config.apply_overrides(args.overrides)

    if args.from_sigmund:
        from ddsp_pytorch_tpu.data.sigmund import preprocess_from_sigmund

        preprocess_from_sigmund(args.from_sigmund, config, args.partition)
        return

    from pathlib import Path

    from ddsp_pytorch_tpu.data.preprocess import preprocess_folder

    root = Path(config.data.data_location)
    partitions = (
        (args.partition,) if args.partition else ("train", "validation")
    )
    for partition in partitions:
        preprocess_folder(root, partition, config)


if __name__ == "__main__":
    main()
