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

# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()


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
    parser.add_argument("--preload", action="store_true",
                        help="train from precomputed HuBERT features (dumps "
                             "any missing ones first); skips the frozen "
                             "HuBERT forward every step")
    parser.add_argument("--preload-dump", action="store_true",
                        help="dump precomputed HuBERT features and exit")
    parser.add_argument("--preload-shift-aug", action="store_true",
                        help="reference preload augmentation (preload_vc_ms"
                             ".py:94-99): random ±12-semitone source shift "
                             "with p=0.7 per epoch item; with --preload-dump "
                             "dumps all 25 shift variants")
    parser.add_argument("--batch-size", type=int, default=None,
                        help="override train.batch_size (measured scaling: "
                             "larger batches raise audio-s/s; see PARITY.md)")
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="tensor-parallel degree over the 'model' mesh "
                             "axis (wide matmuls sharded, XLA collectives "
                             "over ICI); devices = data x model")
    parser.add_argument("--time-limit", type=float, default=None,
                        help="wall-clock budget in seconds: checkpoint and "
                             "exit cleanly when exceeded (pairs with "
                             "auto-resume for scheduled maintenance windows); "
                             "SIGTERM/SIGINT likewise checkpoint-and-exit")
    parser.add_argument("--distributed", action="store_true",
                        help="multi-host: jax.distributed.initialize() before "
                             "anything touches devices (also auto-enabled when "
                             "JAX_COORDINATOR_ADDRESS is set); fails loudly on "
                             "misconfiguration — see docs/multihost.md")
    args = parser.parse_args()

    if args.accelerator == "cpu":
        os.environ["JAX_PLATFORMS"] = "cpu"

    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(levelname)s %(message)s")

    if args.distributed or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        from vcvits_tpu.parallel.mesh import distributed_init
        distributed_init()

    import jax.numpy as jnp

    from vcvits_tpu.config import load_config
    from vcvits_tpu.data.dataset import VoiceConversionDataset, preprocess
    from vcvits_tpu.train.trainer import Trainer
    from vcvits_tpu.utils.provenance import check_git_hash, get_logger

    # experiment provenance (reference utils.py:203-236)
    check_git_hash(args.workdir)
    get_logger(args.workdir).info("train.py args: %s", vars(args))

    cfg = load_config(args.config)
    if args.batch_size:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
        )
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

    if args.preload or args.preload_dump:
        import jax

        from vcvits_tpu.data.preload import SHIFT_SET, dump_hubert_features
        from vcvits_tpu.models.hubert import HubertModel
        from vcvits_tpu.models.synthesizer import hubert_config_for

        hub_params = hubert_params
        if hub_params is None:
            logging.warning("--preload without --hubert-ckpt: dumping features "
                            "from a randomly initialized HuBERT")
            hcfg = hubert_config_for(cfg.model.hubert_channels)
            hub = HubertModel(hcfg, dtype=dtype)
            dummy = jnp.zeros((1, 2640), jnp.float32)
            hub_params = jax.jit(
                lambda k: hub.init(k, dummy)["params"]
            )(jax.random.PRNGKey(cfg.train.seed))
        for files in (cfg.data.training_files, cfg.data.validation_files):
            if os.path.exists(files):
                # shift variants only for the training set (no aug on val)
                shifts = (SHIFT_SET if args.preload_shift_aug
                          and files == cfg.data.training_files else (0,))
                n = dump_hubert_features(
                    VoiceConversionDataset(files, cfg.data), cfg, hub_params,
                    dtype=dtype, pitch_shifts=shifts,
                )
                logging.info("dumped %d HuBERT feature files for %s", n, files)
        if args.preload_dump:
            return

    trainer = Trainer(cfg, workdir=args.workdir, dtype=dtype,
                      hubert_params=hubert_params, preload=args.preload,
                      preload_shift_aug=args.preload_shift_aug,
                      model_parallel=args.model_parallel)
    if args.profile:
        from vcvits_tpu.utils.profiling import trace

        with trace(args.profile):
            trainer.fit(max_steps=args.max_steps, max_seconds=args.time_limit)
    else:
        trainer.fit(max_steps=args.max_steps, max_seconds=args.time_limit)


if __name__ == "__main__":
    main()
