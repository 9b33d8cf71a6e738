#!/usr/bin/env python
"""A/B: D-step semantics — reused G-output (ours) vs reference recompute.

VERDICT r1 weak #7: our D step reuses the G step's y_hat under
stop_gradient; the reference recomputes y_hat with POST-update G weights
and fresh random slices (vcvits.py:151-183). The reference-exact variant
exists behind cfg.train.d_recompute_forward; this script trains both
variants for N steps on an identical synthetic corpus and records the
mel-loss trajectories so the equivalence claim is measured, not argued.

Run:  python tools/ab_dstep.py --steps 5000 --out /tmp/ab_dstep.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def make_corpus(root: str, n_speakers: int = 4, clips: int = 6,
                secs: float = 3.0, sr: int = 48000) -> str:
    from vcvits_tpu.utils.audio_io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(1234)
    lines = []
    t = np.arange(int(sr * secs)) / sr
    for sid in range(n_speakers):
        for i in range(clips):
            f0 = 110 * (2 ** (sid / 4.0)) * (1 + 0.04 * np.sin(2 * np.pi * 0.7 * t))
            y = 0.0
            for h in range(1, 6):
                y = y + np.sin(2 * np.pi * f0 * h * t + rng.uniform(0, 6.28)) / h
            y = (0.25 * y / np.max(np.abs(y))
                 + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
            p = os.path.join(root, f"s{sid}_{i}.wav")
            if not os.path.exists(p):
                write_wav(p, y, sr)
            lines.append(f"{p}|{sid}")
    fl = os.path.join(root, "train.txt")
    with open(fl, "w") as f:
        f.write("\n".join(lines) + "\n")
    return fl


def run(cfg, fl: str, workdir: str, steps: int):
    import jax.numpy as jnp

    from vcvits_tpu.train.trainer import Trainer

    mel_log = []

    trainer = Trainer(cfg, workdir=workdir, dtype=jnp.bfloat16)
    orig = trainer.tb.summarize

    def spy(step, scalars=None, **kw):
        if scalars and "loss/g/mel" in scalars:
            mel_log.append((step, float(scalars["loss/g/mel"]),
                            float(scalars.get("loss/d/total", 0.0))))
        return orig(step, scalars=scalars, **kw)

    trainer.tb.summarize = spy
    trainer.fit(train_files=fl, max_steps=steps)
    return mel_log


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5000)
    ap.add_argument("--root", default="/tmp/ab_dstep")
    ap.add_argument("--out", default="/tmp/ab_dstep.json")
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    from vcvits_tpu.config import Config

    fl = make_corpus(os.path.join(args.root, "corpus"))
    results = {}
    for name, recompute in (("reuse", False), ("recompute", True)):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, batch_size=args.batch, log_interval=100,
                eval_interval=10 ** 9, checkpoint_interval=10 ** 9,
                d_recompute_forward=recompute, max_epochs=10 ** 6),
            data=dataclasses.replace(
                cfg.data, training_files=fl, validation_files="",
                n_speakers=4, cache_dir=os.path.join(args.root, "cache")),
        )
        log = run(cfg, fl, os.path.join(args.root, f"logs_{name}"), args.steps)
        results[name] = log
        tail = [m for _, m, _ in log[-5:]]
        print(f"[{name}] {len(log)} points; final mel (last-5 mean) "
              f"{np.mean(tail):.3f}")
        with open(args.out, "w") as f:
            json.dump(results, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
