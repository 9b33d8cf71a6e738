#!/usr/bin/env python
"""Convert checkpoints in BOTH directions between the reference (PyTorch
Lightning) format and vcvits_tpu checkpoint directories.

Import (reference -> ours; the default):
  python convert_checkpoint.py path/to/last.ckpt -c configs/48k_base.json \
      --workdir logs_converted

Export (ours -> reference-style torch .ckpt, for A/B against the reference):
  python convert_checkpoint.py --export out.ckpt --workdir logs \
      -c configs/48k_base.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", nargs="?", default=None,
                        help="reference Lightning .ckpt path (import mode)")
    parser.add_argument("-c", "--config", default="configs/48k_base.json")
    parser.add_argument("--workdir", default="logs_converted",
                        help="vcvits_tpu checkpoint dir (output for import, "
                             "input for --export)")
    parser.add_argument("--step", type=int, default=None,
                        help="step to store under (import) / load (export)")
    parser.add_argument("--export", default=None, metavar="OUT_CKPT",
                        help="export the workdir's latest checkpoint to a "
                             "torch .ckpt with reference naming")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from vcvits_tpu.config import load_config

    cfg = load_config(args.config)

    if args.export:
        from vcvits_tpu.convert.export_torch import export_lightning_checkpoint
        from vcvits_tpu.train.checkpoint import CheckpointManager

        ckpt_dir = os.path.abspath(os.path.join(args.workdir, "checkpoints"))
        mgr = CheckpointManager(ckpt_dir)
        step = args.step if args.step is not None else mgr.latest_step()
        if step is None:
            raise SystemExit(f"no checkpoint under {ckpt_dir}")
        raw = mgr.restore_raw(step)  # sharding-agnostic (CPU ckpt on TPU etc.)
        sd = export_lightning_checkpoint(
            args.export, raw["g_params"], cfg, d_params=raw.get("d_params"))
        print(f"exported step {step} -> {args.export} ({len(sd)} tensors, "
              f"reference key naming: net_g.* / net_period_d.* / net_scale_d.*)")
        return

    if args.checkpoint is None:
        raise SystemExit("provide a reference .ckpt to import, or --export")

    from vcvits_tpu.convert.vcvits_torch import convert_lightning_checkpoint
    from vcvits_tpu.train.checkpoint import CheckpointManager
    from vcvits_tpu.train.state import create_train_state

    g_params, d_params = convert_lightning_checkpoint(args.checkpoint, cfg)
    if d_params is None:
        raise SystemExit("checkpoint has no discriminators; cannot build full state")

    state = create_train_state(cfg, g_params, d_params)
    os.makedirs(args.workdir, exist_ok=True)
    with open(os.path.join(args.workdir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=1)
    step = args.step if args.step is not None else 0
    mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    mgr.save(step, state)
    mgr.wait()
    print(f"converted -> {args.workdir} (step {step}); "
          f"resume training with train.py --workdir {args.workdir} or "
          f"run infer.py --workdir {args.workdir}")


if __name__ == "__main__":
    main()
