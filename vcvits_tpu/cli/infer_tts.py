#!/usr/bin/env python
"""TTS synthesis CLI: text -> 48 kHz wav from a TTSTrainer checkpoint.

The reference has no TTS inference entry point (its TTS path is broken as
shipped — SURVEY.md §2.5); this CLI completes this framework's working
TTS path:

  python infer_tts.py "Hello world." out.wav --workdir logs_tts --sid 0
  python infer_tts.py --text-file lines.txt outdir/ --workdir logs_tts
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
    parser.add_argument("text", nargs="*",
                        help="text(s) to synthesize; or use --text-file")
    parser.add_argument("output",
                        help="output wav, or a directory when synthesizing "
                             "multiple texts")
    parser.add_argument("--text-file", default=None,
                        help="file with one utterance per line (# comments "
                             "skipped); combined with positional texts")
    parser.add_argument("--sid", type=int, default=0)
    parser.add_argument("--noise-scale", type=float, default=0.667)
    parser.add_argument("--noise-scale-w", type=float, default=0.8)
    parser.add_argument("--length-scale", type=float, default=1.0)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=None,
                        help="decoder frame budget override (default: "
                             "20 per padded token)")
    parser.add_argument("--workdir", default="logs_tts")
    parser.add_argument("-c", "--config", default=None)
    parser.add_argument("--step", type=int, default=None,
                        help="checkpoint step (default: latest)")
    parser.add_argument("--cleaners", nargs="+", default=["english_cleaners"],
                        help="text cleaners, space-separated (must match "
                             "training; same format as train_tts)")
    parser.add_argument("--add-blank", action="store_true",
                        help="intersperse blank tokens (must match training)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    texts = list(args.text)
    if args.text_file:
        with open(args.text_file) as f:
            lines = [ln.strip() for ln in f]
            texts += [ln for ln in lines if ln and not ln.startswith("#")]
    if not texts:
        parser.error("no text given (positional or --text-file)")

    from vcvits_tpu.config import load_config
    from vcvits_tpu.infer_tts import TTSSynthesizer

    cfg = load_config(args.config) if args.config else None
    tts = TTSSynthesizer.from_checkpoint(
        args.workdir, cfg=cfg, step=args.step,
        cleaners=tuple(args.cleaners), add_blank=args.add_blank,
    )

    if len(texts) > 1:
        os.makedirs(args.output, exist_ok=True)
        outs = [os.path.join(args.output, f"utt_{i:04d}.wav")
                for i in range(len(texts))]
    else:
        parent = os.path.dirname(os.path.abspath(args.output))
        os.makedirs(parent, exist_ok=True)
        outs = [args.output]

    # per-utterance seed offset: duplicate lines get independent (but still
    # reproducible) SDP/prior noise instead of bit-identical audio
    for i, (text, out) in enumerate(zip(texts, outs)):
        tts.synthesize_to_file(
            text, out, sid=args.sid, noise_scale=args.noise_scale,
            noise_scale_w=args.noise_scale_w, length_scale=args.length_scale,
            seed=args.seed + i, max_frames=args.max_frames,
        )


if __name__ == "__main__":
    main()
