#!/usr/bin/env python
"""Train-step A/B benchmark: period-folded MPD (and other toggles) on TPU.

Measures the full jitted GAN step (G+D update) at the 48k config on a
synthetic batch, comparing DiscriminatorP.fold_period on/off.

Run:  python tools/bench_train_step.py [--batch 8] [--secs 4] [--steps 12]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
from unittest import mock

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


def run_variant(cfg, batch, steps, fold_period: bool) -> float:
    import jax
    import jax.numpy as jnp

    import vcvits_tpu.train.step as step_mod
    from vcvits_tpu.models.discriminators import MultiPeriodDiscriminator
    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.step import init_params, make_train_step

    mpd_cls = functools.partial(MultiPeriodDiscriminator, fold_period=fold_period)
    with mock.patch.object(step_mod, "MultiPeriodDiscriminator", mpd_cls):
        g_params, d_params = init_params(
            cfg, jax.random.PRNGKey(0), batch, dtype=jnp.bfloat16)
        state = create_train_state(cfg, g_params, d_params, steps_per_epoch=1000)
        train_step = jax.jit(
            make_train_step(cfg, dtype=jnp.bfloat16, steps_per_epoch=1000),
            donate_argnums=(0,))
        rng = jax.random.PRNGKey(1)
        state, metrics = train_step(state, batch, rng)  # compile
        float(jnp.mean(metrics["loss/g/total"]))
        ts = []
        for i in range(steps):
            rng, k = jax.random.split(rng)
            t0 = time.perf_counter()
            state, metrics = train_step(state, batch, k)
            float(jnp.mean(metrics["loss/g/total"]))  # honest device sync
            ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--steps", type=int, default=12)
    args = ap.parse_args()

    from vcvits_tpu.config import Config

    cfg = Config()
    batch = make_batch(cfg, args.batch, args.secs, np.random.default_rng(0))
    for fold in (False, True):
        med = run_variant(cfg, batch, args.steps, fold_period=fold)
        print(f"fold_period={fold}: median {med*1000:.1f} ms/step "
              f"({1.0/med:.2f} steps/s, B={args.batch} x {args.secs}s bf16)")


if __name__ == "__main__":
    main()
