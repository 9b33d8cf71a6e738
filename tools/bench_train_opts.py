#!/usr/bin/env python
"""Train-step optimization sweep: remat policy x discriminator im2col.

VERDICT r2 #1: measure the named-but-unmeasured candidates at real batch
sizes. Interleaved same-process A/B (the only timing this tunnel trusts),
sync-amortized over K chained steps like bench.py.

  python tools/bench_train_opts.py --batches 16,32 --secs 4 --steps 6
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def make_batch(cfg, batch, secs, rng):
    import jax.numpy as jnp

    d = cfg.data
    unit = 2560
    t16 = int(secs * d.source_sampling_rate) // unit * unit
    t48 = t16 * d.target_sampling_rate // d.source_sampling_rate
    return {
        "x_wav": jnp.asarray(rng.standard_normal((batch, t16)).astype(np.float32) * 0.1),
        "x_wav_lengths": jnp.full((batch,), t16, jnp.int32),
        "x_pitch": jnp.asarray(rng.integers(1, cfg.model.num_pitch, (batch, t16 // 320))),
        "y_wav": jnp.asarray(rng.standard_normal((batch, t48)).astype(np.float32) * 0.1),
        "y_wav_lengths": jnp.full((batch,), t48, jnp.int32),
        "sid": jnp.asarray(rng.integers(0, cfg.data.n_speakers, (batch,))),
    }


def time_variant(name, cfg, batch, steps, reps=3):
    """Median of `reps` sync-amortized runs of `steps` chained steps."""
    import jax
    import jax.numpy as jnp

    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.step import init_params, make_train_step

    try:
        g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch,
                                         dtype=jnp.bfloat16)
        state = create_train_state(cfg, g_params, d_params, steps_per_epoch=1000)
        step = jax.jit(make_train_step(cfg, dtype=jnp.bfloat16,
                                       steps_per_epoch=1000),
                       donate_argnums=(0,))
        state, m = step(state, batch, jax.random.PRNGKey(1))
        float(m["loss/g/total"])  # compile + warm
        meds = []
        for rep in range(reps):
            t0 = time.perf_counter()
            for i in range(steps):
                state, m = step(state, batch, jax.random.PRNGKey(2 + i))
            float(m["loss/g/total"])
            meds.append((time.perf_counter() - t0) / steps)
        ms = float(np.median(meds)) * 1e3
        print(f"  {name}: {ms:.1f} ms/step "
              f"({1e3 / ms:.2f} steps/s)", flush=True)
        del state
        return ms, None
    except Exception as e:  # OOM etc.
        err = f"{type(e).__name__}: {str(e)[:200]}"
        print(f"  {name}: FAILED ({err[:140]})", flush=True)
        return None, err


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32")
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=6)
    ap.add_argument("--variants", default="",
                    help="comma-separated variant names to run (default all)")
    ap.add_argument("--out", default="reports/train_opts_r5.json")
    args = ap.parse_args()

    from vcvits_tpu.config import Config

    base = Config()
    # Variants are RELATIVE TO CURRENT DEFAULTS (r5: disc_im2col=True,
    # share_frozen_hubert=True) — "baseline" is what training ships with.
    variants = [
        ("baseline", {}),
        ("im2col_off", {"disc_im2col": False}),
        ("time_fold", {"disc_time_fold": True}),  # on top of default im2col
        ("time_fold_only", {"disc_time_fold": True, "disc_im2col": False}),
        ("grouped_pack", {"disc_grouped_pack": True, "disc_im2col": False}),
        # compose: time_fold where pick_time_chunks engages, phase-packed
        # grouped conv as the fallback for what it leaves (layers.py order)
        ("time_fold_pack", {"disc_time_fold": True,
                            "disc_grouped_pack": True}),
        ("share_hubert_off", {"share_frozen_hubert": False}),
    ]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants if v[0] in keep]
    rng = np.random.default_rng(7)
    results = {}
    for b in [int(x) for x in args.batches.split(",")]:
        print(f"batch {b} x {args.secs}s bf16:", flush=True)
        cfgb = dataclasses.replace(
            base, train=dataclasses.replace(base.train, batch_size=b))
        batch = make_batch(cfgb, b, args.secs, rng)
        res = {}
        for name, overrides in variants:
            cfgv = dataclasses.replace(
                cfgb, train=dataclasses.replace(cfgb.train, **overrides))
            res[name], err = time_variant(name, cfgv, batch, args.steps)
            if err is not None:
                res[name + "_error"] = err
        results[b] = res
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
