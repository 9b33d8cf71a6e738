#!/usr/bin/env python
"""Convert a reference (PyTorch Lightning) VCVITS checkpoint into a
vcvits_tpu checkpoint directory that train.py/infer.py can use directly.

  python convert_checkpoint.py path/to/last.ckpt -c configs/48k_base.json \
      --workdir logs_converted
"""

from __future__ import annotations

import argparse
import json
import logging
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="reference Lightning .ckpt path")
    parser.add_argument("-c", "--config", default="configs/48k_base.json")
    parser.add_argument("--workdir", default="logs_converted")
    parser.add_argument("--step", type=int, default=0,
                        help="step number to store the converted state under")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)

    from vcvits_tpu.config import load_config
    from vcvits_tpu.convert.vcvits_torch import convert_lightning_checkpoint
    from vcvits_tpu.train.checkpoint import CheckpointManager
    from vcvits_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    g_params, d_params = convert_lightning_checkpoint(args.checkpoint, cfg)
    if d_params is None:
        raise SystemExit("checkpoint has no discriminators; cannot build full state")

    state = create_train_state(cfg, g_params, d_params)
    os.makedirs(args.workdir, exist_ok=True)
    with open(os.path.join(args.workdir, "config.json"), "w") as f:
        json.dump(cfg.to_dict(), f, indent=1)
    mgr = CheckpointManager(os.path.join(args.workdir, "checkpoints"))
    mgr.save(args.step, state)
    mgr.wait()
    print(f"converted -> {args.workdir} (step {args.step}); "
          f"resume training with train.py --workdir {args.workdir} or "
          f"run infer.py --workdir {args.workdir}")


if __name__ == "__main__":
    main()
