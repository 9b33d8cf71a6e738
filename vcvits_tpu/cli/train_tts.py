#!/usr/bin/env python
"""TTS training CLI (the working version of the reference's broken VITS path).

Filelist lines: "path|sid|text".

  python train_tts.py -c configs/48k_base.json --filelist filelists/tts_train.txt
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
    parser.add_argument("-c", "--config", default="configs/48k_base.json")
    parser.add_argument("--filelist", required=True)
    parser.add_argument("--workdir", default="logs_tts")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--cleaners", nargs="+", default=["english_cleaners"])
    parser.add_argument("--add-blank", action="store_true",
                        help="intersperse blank ids between symbols (the "
                             "upstream VITS data.add_blank option)")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    import jax.numpy as jnp

    from vcvits_tpu.config import load_config
    from vcvits_tpu.train.tts_trainer import TTSTrainer

    cfg = load_config(args.config)
    dtype = jnp.bfloat16 if (args.bf16 or cfg.train.fp16_run) else jnp.float32
    trainer = TTSTrainer(cfg, workdir=args.workdir, dtype=dtype,
                         cleaners=args.cleaners, add_blank=args.add_blank)
    trainer.fit(args.filelist, max_steps=args.max_steps)


if __name__ == "__main__":
    main()
