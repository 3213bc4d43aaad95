#!/usr/bin/env python
"""Timbre-transfer CLI: re-render any monophonic wav with a trained model.

``python transfer.py --bundle export/ddsp_violin_bundle --input voice.wav
--output violin.wav [--octave-shift 1]``

(The reference offers this only live in Pure Data; this is the offline
batch path over the same pipeline: pitch + A-weighted loudness extraction →
decoder → synths → exported reverb.)
"""

import argparse


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--platform", default=None,
                   help="force a JAX platform (e.g. cpu)")
    p.add_argument("--bundle", required=True)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--octave-shift", type=float, default=0.0)
    p.add_argument("--loudness-shift", type=float, default=0.0)
    p.add_argument("--no-reverb", action="store_true")
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ddsp_pytorch_tpu.config import Config
    from ddsp_pytorch_tpu.inference import timbre_transfer
    from ddsp_pytorch_tpu.utils import load_wav, save_wav
    from os import path

    if not path.exists(path.join(args.bundle, "config.yaml")):
        p.error(f"not an exported bundle (no config.yaml): {args.bundle}")
    config = Config.from_yaml(path.join(args.bundle, "config.yaml"))
    sr = config.preprocess.sample_rate
    audio, _ = load_wav(args.input, sr)
    out = timbre_transfer(
        args.bundle,
        audio,
        sr,
        octave_shift=args.octave_shift,
        loudness_shift=args.loudness_shift,
        include_reverb=not args.no_reverb,
    )
    save_wav(args.output, out, sr)
    print(f"wrote {args.output} ({len(out) / sr:.2f}s at {sr} Hz)")


if __name__ == "__main__":
    main()
