#!/usr/bin/env python
"""Export CLI (parity: reference export.py).

``python export.py --run runs/NAME [--out-dir export]`` → parameter bundle +
reverb impulse wav + frozen config, consumable by the streaming runtime
(and by performance.py / bench.py).
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run", required=True)
    p.add_argument("--out-dir", default="export")
    p.add_argument("--name", default=None)
    args = p.parse_args()

    from ddsp_pytorch_tpu.export import export_run

    bundle = export_run(args.run, args.out_dir, name=args.name)
    print(f"exported bundle: {bundle}")


if __name__ == "__main__":
    main()
