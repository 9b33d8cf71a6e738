#!/usr/bin/env python
"""Attribute the residual host-RSS creep: bare train step vs full loop.

The r5 20k-step convergence run (reports/convergence_r5.json, ROADMAP
item 31) shows ~0.2 MB/step baseline RSS growth even with periodic
malloc_trim. This probe runs ONLY the jitted train step — same config,
same batch, no validation, no TensorBoard, no checkpointing, no data
loader — sampling RSS every `--sample` steps with the same trim cadence
the trainer uses. A flat curve here pins the creep on the loop's host
side (eval fetches / TB / Orbax); a matching slope pins it on the step
dispatch itself (tunnel-client buffers per execute call).

  python tools/probe_step_rss.py --steps 2000 --batch 16 \
      --out reports/step_rss_r5.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np

from tools.bench_train_opts import make_batch


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=2000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--sample", type=int, default=100)
    ap.add_argument("--trim-every", type=int, default=200,
                    help="malloc_trim cadence (trainer default)")
    ap.add_argument("--out", default="reports/step_rss_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.step import init_params, make_train_step
    from vcvits_tpu.utils.memory import trim_host_memory

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch))
    rng = np.random.default_rng(7)
    batch = make_batch(cfg, args.batch, args.secs, rng)

    g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch,
                                     dtype=jnp.bfloat16)
    state = create_train_state(cfg, g_params, d_params, steps_per_epoch=1000)
    step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16,
                                   steps_per_epoch=1000),
                   donate_argnums=(0,))
    state, m = step(state, batch, jax.random.PRNGKey(1))
    float(m["loss/g/total"])  # compile + warm
    trim_host_memory()

    t0 = time.perf_counter()
    samples = [{"step": 0, "rss_mb": round(_rss_mb(), 1)}]
    for i in range(1, args.steps + 1):
        state, m = step(state, batch, jax.random.PRNGKey(1 + i))
        if i % args.sample == 0:
            # same device->host sync the trainer's log path pays
            float(m["loss/g/total"])
            if args.trim_every and i % args.trim_every == 0:
                trim_host_memory(collect=False)
            samples.append({"step": i, "rss_mb": round(_rss_mb(), 1)})
            print(f"step {i}: rss {samples[-1]['rss_mb']:.0f} MB", flush=True)
    float(m["loss/g/total"])
    wall = time.perf_counter() - t0

    first, last = samples[1]["rss_mb"], samples[-1]["rss_mb"]
    slope_kb = (last - first) * 1024.0 / max(args.steps - args.sample, 1)
    report = {
        "steps": args.steps,
        "batch": args.batch,
        "secs": args.secs,
        "trim_every": args.trim_every,
        "samples": samples,
        "rss_first_sampled_mb": first,
        "rss_last_mb": last,
        "slope_kb_per_step": round(slope_kb, 2),
        "steps_per_s": round(args.steps / wall, 2),
        # reference slope from the full training loop, for the comparison
        # this probe exists to make (convergence_r5.json: 12.7->22.2 GB
        # over 20k steps incl. a +5 GB phase-2 re-preload artifact)
        "convergence_r5_gross_kb_per_step": round(
            (22199.6 - 12723.9) * 1024.0 / 19900, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {args.out}: {slope_kb:.1f} kB/step bare-step slope "
          f"({report['steps_per_s']} steps/s)", flush=True)


if __name__ == "__main__":
    main()
