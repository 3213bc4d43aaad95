#!/usr/bin/env python
"""Export CLI (parity: reference export.py).

``python export.py --run runs/NAME [--out-dir export]`` → parameter bundle +
reverb impulse wav + frozen config, consumable by the streaming runtime
(and by performance.py / bench.py).
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--run", required=True)
    p.add_argument("--out-dir", default="export")
    p.add_argument("--name", default=None)
    p.add_argument(
        "--data",
        action="store_true",
        help="also copy the training wavs next to the bundle "
        "(reference export.py DATA option)",
    )
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="KEY.PATH=VALUE",
                   help="override any field of the run's frozen config "
                        "before export (dotted path, YAML-parsed value; "
                        "repeatable)")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ddsp_pytorch_tpu.export import export_run

    bundle = export_run(
        args.run, args.out_dir, name=args.name, overrides=args.overrides
    )
    print(f"exported bundle: {bundle}")

    if args.data:
        import shutil
        from os import makedirs, path

        from ddsp_pytorch_tpu.config import Config
        from ddsp_pytorch_tpu.data.preprocess import get_files

        config = Config.from_yaml(path.join(bundle, "config.yaml"))
        data_dir = path.join(args.out_dir, "data")
        root = path.abspath(config.data.data_location)
        files = get_files(config.data.data_location, config.data.extension)
        for f in files:
            # preserve the tree relative to data_location: the recursive
            # glob crosses partitions/subfolders, and same-named files
            # (train/a.wav vs validation/a.wav) must not overwrite each
            # other in a flat directory
            rel = path.relpath(path.abspath(str(f)), root)
            dst = path.join(data_dir, rel)
            makedirs(path.dirname(dst), exist_ok=True)
            shutil.copy2(f, dst)
        print(f"copied {len(files)} wavs to {data_dir}")


if __name__ == "__main__":
    main()
