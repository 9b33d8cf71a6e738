#!/usr/bin/env python
"""E2E train-loop throughput A/B: device-resident cache vs streaming loader.

Unlike tools/bench_train_step.py (pure step time on a resident batch),
this measures the FULL loop the Trainer runs — loader -> (h2d | on-device
gather) -> jitted G+D step — which is where the device cache
(data/device_cache.py) moves the needle: per-step h2d drops from ~B MB of
audio to a ~64 B index vector, so dispatch pipelining is never stalled by
the transfer. Timing is sync-amortized (one scalar digest at the END of
the timed window), matching how the trainer itself runs (host-side step
counter, no per-step sync).

Run:  python tools/ab_device_cache.py [--batches 16 32 64] [--steps 40]
Writes reports/ab_device_cache_r3.json.
"""

from __future__ import annotations

import argparse
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


def run_variant(cfg, dataset, batch_size, steps, device_cache: bool,
                warmup: int = 4):
    import jax
    import jax.numpy as jnp

    from vcvits_tpu.data.loader import BucketedLoader, prefetch
    from vcvits_tpu.parallel.mesh import make_mesh, shard_batch
    from vcvits_tpu.train.state import create_train_state
    from vcvits_tpu.train.step import init_params, make_train_step

    mesh = make_mesh()

    def batches():
        """Endless stream of batches through the variant's data path."""
        if device_cache:
            from vcvits_tpu.data.device_cache import DeviceBatcher
            batcher = DeviceBatcher(dataset, cfg.data, batch_size, mesh=mesh)
            epoch = 0
            while True:
                for b in batcher.epoch_batches(epoch):
                    yield b
                epoch += 1
        else:
            loader = BucketedLoader(dataset, cfg.data, batch_size)
            epoch = 0
            while True:
                for b in prefetch(loader.epoch_batches(epoch)):
                    yield shard_batch(b, mesh)
                epoch += 1

    stream = batches()
    first = next(stream)
    g_params, d_params = init_params(
        cfg, jax.random.PRNGKey(0), batch_size, dtype=jnp.bfloat16)
    state = create_train_state(cfg, g_params, d_params, steps_per_epoch=1000)
    train_step = jax.jit(
        make_train_step(cfg, dtype=jnp.bfloat16, steps_per_epoch=1000),
        donate_argnums=(0,))
    rng = jax.random.PRNGKey(1)
    state, metrics = train_step(state, first, rng)  # compile
    float(jnp.mean(metrics["loss/g/total"]))
    for _ in range(warmup):
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, next(stream), k)
    float(jnp.mean(metrics["loss/g/total"]))  # drain the pipe before timing

    t0 = time.perf_counter()
    for _ in range(steps):
        rng, k = jax.random.split(rng)
        state, metrics = train_step(state, next(stream), k)
    digest = float(jnp.mean(metrics["loss/g/total"]))  # one end sync
    dt = time.perf_counter() - t0
    del state, train_step, stream
    return dt / steps, digest


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[16, 32, 64])
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--secs-min", type=float, default=3.5)
    ap.add_argument("--clips", type=int, default=24, help="clips per speaker")
    ap.add_argument("--speakers", type=int, default=12)
    ap.add_argument("--root", default="/tmp/ab_vdc")
    ap.add_argument("--out", default="reports/ab_device_cache_r3.json")
    args = ap.parse_args()

    from tools.convergence_run import make_corpus
    from vcvits_tpu.config import Config
    from vcvits_tpu.data.dataset import VoiceConversionDataset

    import dataclasses

    cfg = Config()
    fl = make_corpus(os.path.join(args.root, "corpus"), args.speakers,
                     args.clips)
    cfg = dataclasses.replace(cfg, data=dataclasses.replace(
        cfg.data, training_files=fl, n_speakers=max(args.speakers, 8),
        cache_dir=os.path.join(args.root, "cache")))
    ds = VoiceConversionDataset(fl, cfg.data)
    print(f"corpus: {len(ds)} clips", flush=True)

    # mean audio seconds per item at the bucketed lengths (for audio-s/s)
    from vcvits_tpu.data.collate import bucket_lengths, pick_bucket
    buckets = bucket_lengths(cfg.data)
    secs = [pick_bucket(len(ds.get_item(i)["x_wav"]), buckets)
            / cfg.data.source_sampling_rate for i in range(len(ds))]
    mean_secs = float(np.mean(secs))
    print(f"mean bucketed clip length: {mean_secs:.2f}s", flush=True)

    results = {}
    # interleave variants per batch size (same-process A/B, tunnel drift)
    for b in args.batches:
        row = {}
        for dc in (True, False, True):  # cache, stream, cache-again
            key = "cache" if dc else "stream"
            sps, digest = run_variant(cfg, ds, b, args.steps, dc)
            row.setdefault(key, []).append(sps)
            print(f"B={b} {key}: {sps*1000:.1f} ms/step "
                  f"({b*mean_secs/sps:.0f} audio-s/s) digest={digest:.3f}",
                  flush=True)
        results[b] = {
            "ms_step_cache": [round(s * 1000, 1) for s in row["cache"]],
            "ms_step_stream": [round(s * 1000, 1) for s in row["stream"]],
            "audio_s_per_s_cache": round(b * mean_secs / min(row["cache"]), 1),
            "audio_s_per_s_stream": round(b * mean_secs / min(row["stream"]), 1),
        }

    report = {"steps": args.steps, "mean_clip_secs": round(mean_secs, 3),
              "clips": len(ds), "bf16": True, "by_batch": results}
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report["by_batch"], indent=1), flush=True)


if __name__ == "__main__":
    main()
