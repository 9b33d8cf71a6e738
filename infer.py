#!/usr/bin/env python
"""Inference CLI: any-to-any 48 kHz voice conversion.

Capability parity with /root/reference/infer.py (which hardcodes its paths
and speaker; here they're flags):

  python infer.py source.wav out.wav --sid 256 --pitch-shift 0 \
      --workdir logs -c configs/48k_base.json
"""

from __future__ import annotations

import argparse
import logging

import os

# persistent XLA compile cache: repeat runs skip the (minutes-long) compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vcvits_tpu_xla"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("source")
    parser.add_argument("output")
    parser.add_argument("--sid", type=int, default=256)
    parser.add_argument("--vc-source-sid", type=int, default=None,
                        help="flow-swap mode: source audio is OF this speaker; "
                             "convert to --sid via the latent flow swap")
    parser.add_argument("--pitch-shift", type=int, default=0)
    parser.add_argument("--noise-scale", type=float, default=1.0)
    parser.add_argument("--workdir", default="logs")
    parser.add_argument("-c", "--config", default=None)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from vcvits_tpu.config import load_config
    from vcvits_tpu.infer import VoiceConverter

    cfg = load_config(args.config) if args.config else None
    vc = VoiceConverter.from_checkpoint(args.workdir, cfg=cfg)
    if args.vc_source_sid is not None:
        vc.voice_conversion(args.source, args.output, args.vc_source_sid, args.sid)
    else:
        vc.convert(args.source, args.output, args.sid,
                   pitch_shift=args.pitch_shift, noise_scale=args.noise_scale)
    print(f"wrote {args.output}")


if __name__ == "__main__":
    main()
