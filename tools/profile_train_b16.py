#!/usr/bin/env python
"""Per-op TPU time breakdown of the train step at a given batch size.

VERDICT r3 #1: B=16 train MFU is 0.349 vs 0.539 at B=64 — profile the
B=16 step and attack what the profile shows. This tool captures a
jax.profiler trace of K chained steps and reduces the xplane to:
  * total device time per step
  * time grouped by HLO op category (conv, dot, elementwise fusion, ...)
  * the top-N individual HLO ops with their source-annotated names

  python tools/profile_train_b16.py --batch 16 --secs 4 --steps 4
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tempfile
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np

from tools.bench_train_opts import make_batch


def capture(cfg, batch, steps, logdir):
    import jax
    import jax.numpy as jnp

    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.step import init_params, make_train_step

    g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch,
                                     dtype=jnp.bfloat16)
    state = create_train_state(cfg, g_params, d_params, steps_per_epoch=1000)
    step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16,
                                   steps_per_epoch=1000),
                   donate_argnums=(0,))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["loss/g/total"])  # compile + warm

    jax.profiler.start_trace(logdir)
    t0 = time.perf_counter()
    for i in range(steps):
        state, m = step(state, batch, jax.random.PRNGKey(2 + i))
    float(m["loss/g/total"])
    wall = (time.perf_counter() - t0) / steps
    jax.profiler.stop_trace()
    return wall


def analyze(logdir, steps, top_n=40):
    """Reduce the captured xplane to op-category and top-op tables.

    Direct XSpace-proto parse (tools/xplane_summary.py) — the
    tensorboard_plugin_profile converter in this image is broken against
    its own TF build."""
    from tools.xplane_summary import analyze as xp_analyze

    return xp_analyze(logdir, steps, top_n=top_n)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--keep-trace", action="store_true")
    args = ap.parse_args()

    from vcvits_tpu.config import Config

    cfg = Config()
    rng = np.random.default_rng(7)
    batch = make_batch(cfg, args.batch, args.secs, rng)

    logdir = tempfile.mkdtemp(prefix="profile_b16_")
    wall = capture(cfg, batch, args.steps, logdir)
    result = analyze(logdir, args.steps)
    result["wall_s_per_step"] = round(wall, 4)
    result["batch"] = args.batch
    result["secs"] = args.secs
    out = args.out or f"reports/profile_train_b{args.batch}.json"
    with open(out, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if k != "top_ops"},
                     indent=1))
    for op in result["top_ops"][:25]:
        print(f"{op['us_per_step']:>9.1f} us  {op['category']:<22}"
              f" x{op['occurrences']:<5} {op['op'][:110]}")
    if not args.keep_trace:
        import shutil
        shutil.rmtree(logdir, ignore_errors=True)
    else:
        print("trace kept at", logdir)


if __name__ == "__main__":
    main()
