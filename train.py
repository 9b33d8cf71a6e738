#!/usr/bin/env python
"""Training CLI.

Capability parity with /root/reference/train.py (same flags where they make
sense on TPU): load JSON config, optional offline preprocess fan-out, build
datasets/loaders, train with data-parallel sharding, checkpoint every N
steps, auto-resume from the latest checkpoint.

  python train.py -c configs/48k_base.json --cachedir cache --workdir logs
"""

from __future__ import annotations

import argparse
import dataclasses
import logging
import os

import os

# persistent XLA compile cache: repeat runs skip the (minutes-long) compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vcvits_tpu_xla"))


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", default="configs/48k_base.json")
    parser.add_argument("-a", "--accelerator", default="tpu",
                        help="tpu|cpu (cpu forces the XLA host backend)")
    parser.add_argument("-d", "--device", default=None,
                        help="unused on TPU (kept for reference CLI parity)")
    parser.add_argument("-s", "--skip-preprocess", action="store_true")
    parser.add_argument("--cachedir", default=None)
    parser.add_argument("--workdir", default="logs")
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute (fp16_run in the reference config)")
    parser.add_argument("--hubert-ckpt", default=None,
                        help="torch HuBERT checkpoint (fairseq .pt) to convert+load")
    parser.add_argument("--profile", default=None,
                        help="capture a jax.profiler trace into this directory")
    args = parser.parse_args()

    if args.accelerator == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    import jax.numpy as jnp

    from vcvits_tpu.config import load_config
    from vcvits_tpu.data.dataset import VoiceConversionDataset, preprocess
    from vcvits_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    if args.cachedir:
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, cache_dir=args.cachedir)
        )

    if not args.skip_preprocess:
        for files in (cfg.data.training_files, cfg.data.validation_files):
            if os.path.exists(files):
                preprocess(VoiceConversionDataset(files, cfg.data), num_workers=8)

    dtype = jnp.bfloat16 if (args.bf16 or cfg.train.fp16_run) else jnp.float32
    hubert_params = None
    if args.hubert_ckpt:
        from vcvits_tpu.convert.hubert_torch import load_fairseq_checkpoint
        from vcvits_tpu.models.synthesizer import hubert_config_for

        hubert_params = load_fairseq_checkpoint(
            args.hubert_ckpt, hubert_config_for(cfg.model.hubert_channels)
        )

    trainer = Trainer(cfg, workdir=args.workdir, dtype=dtype,
                      hubert_params=hubert_params)
    if args.profile:
        from vcvits_tpu.utils.profiling import trace

        with trace(args.profile):
            trainer.fit(max_steps=args.max_steps)
    else:
        trainer.fit(max_steps=args.max_steps)


if __name__ == "__main__":
    main()
