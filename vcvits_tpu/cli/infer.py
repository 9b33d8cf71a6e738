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

# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("source", nargs="+",
                        help="source wav(s); multiple sources pipeline host "
                             "prep against device decode")
    parser.add_argument("output",
                        help="output wav, or a directory when converting "
                             "multiple sources")
    parser.add_argument("--sid", type=int, default=256)
    parser.add_argument("--vc-source-sid", type=int, default=None,
                        help="flow-swap mode: source audio is OF this speaker; "
                             "convert to --sid via the latent flow swap")
    parser.add_argument("--pitch-shift", type=int, default=0)
    parser.add_argument("--noise-scale", type=float, default=1.0)
    parser.add_argument("--workdir", default="logs")
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("--int8-decoder", action="store_true",
                        help="int8 decoder convs (same checkpoint, small "
                             "quantization noise — see docs/quantization; "
                             "measured SLOWER than bf16 end-to-end on v5e)")
    parser.add_argument("--int8-decoder-mode", choices=("w8a8", "w8"),
                        default="w8a8",
                        help="w8a8 = dynamic int8 acts + weights on the "
                             "int8 MXU; w8 = weight-only int8, bf16 acts")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from vcvits_tpu.config import load_config
    from vcvits_tpu.infer import VoiceConverter

    cfg = load_config(args.config) if args.config else None
    quant = (args.int8_decoder
             and (True if args.int8_decoder_mode == "w8a8" else "w8"))
    vc = VoiceConverter.from_checkpoint(args.workdir, cfg=cfg,
                                        quant_int8=quant)

    if len(args.source) > 1:
        # colliding basenames would silently overwrite one another
        names = [os.path.basename(s) for s in args.source]
        dupes = {n for n in names if names.count(n) > 1}
        if dupes:
            parser.error(f"multiple sources share basename(s) {sorted(dupes)}; "
                         f"outputs would overwrite — rename or run separately")
        os.makedirs(args.output, exist_ok=True)

    if args.vc_source_sid is not None:
        for src in args.source:
            out = (os.path.join(args.output, os.path.basename(src))
                   if len(args.source) > 1 else args.output)
            vc.voice_conversion(src, out, args.vc_source_sid, args.sid)
            print(f"wrote {out}")
    elif len(args.source) == 1:
        vc.convert(args.source[0], args.output, args.sid,
                   pitch_shift=args.pitch_shift, noise_scale=args.noise_scale)
        print(f"wrote {args.output}")
    else:
        jobs = [(src, os.path.join(args.output, os.path.basename(src)), args.sid)
                for src in args.source]
        vc.convert_many(jobs, pitch_shift=args.pitch_shift,
                        noise_scale=args.noise_scale)
        for _, dst, _ in jobs:
            print(f"wrote {dst}")


if __name__ == "__main__":
    main()
