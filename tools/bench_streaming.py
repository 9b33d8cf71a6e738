#!/usr/bin/env python
"""Streaming VC benchmark: windowed-overlap vs cached-conv-state incremental.

Measures, on the real chip at the 48k config (random-init weights — timing
is weight-independent):
  * per-chunk wall time (median) and its breakdown budget,
  * streaming RTF (audio seconds produced per wall second),
  * algorithmic latency (chunk + right context + decoder delay).

Run:  python tools/bench_streaming.py [--chunk 0.32] [--ctx 0.16] [--secs 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=float, default=0.32)
    ap.add_argument("--ctx", type=float, default=0.16)
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--mode", default="both", choices=["both", "windowed", "incremental"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.infer import VoiceConverter
    from vcvits_tpu.models.synthesizer import SynthesizerSVC
    from vcvits_tpu.streaming import StreamingConverter

    cfg = Config()
    gen = SynthesizerSVC.from_config(cfg)
    t = 7680
    k = jax.random.PRNGKey(0)
    variables = gen.init(
        {"params": k, "sample": k},
        jnp.zeros((1, t)), jnp.array([t]), jnp.zeros((1, t // 320), jnp.int32),
        jnp.array([0]), method=SynthesizerSVC.infer,
    )
    vc = VoiceConverter(cfg, variables["params"])

    sr = cfg.data.source_sampling_rate
    total = int(sr * args.secs)
    tt = np.arange(total) / sr
    src = (0.4 * np.sin(2 * np.pi * 220 * tt)
           + 0.05 * np.random.default_rng(0).standard_normal(total)).astype(np.float32)

    modes = (["windowed", "incremental"] if args.mode == "both" else [args.mode])
    for mode in modes:
        sc = StreamingConverter(vc, speaker_id=1, chunk_seconds=args.chunk,
                                context_seconds=args.ctx, noise_scale=0.667,
                                incremental=(mode == "incremental"))
        # warm up compiles on the first chunk
        warm = src[: sc.chunk + sc.ctx + 1]
        list(sc.push(warm))
        sc.reset()

        chunk_times = []
        produced = 0
        feed = sc.chunk  # steady-state: one chunk per push
        consumed = 0
        # prime with the right-context so the first timed push emits
        list(sc.push(src[: sc.ctx]))
        consumed = sc.ctx
        while consumed + feed <= total:
            t0 = time.perf_counter()
            for piece in sc.push(src[consumed: consumed + feed]):
                produced += len(piece)
            # force device sync via a host-visible scalar
            chunk_times.append(time.perf_counter() - t0)
            consumed += feed
        for piece in sc.flush():
            produced += len(piece)

        ct = np.array(chunk_times[1:]) if len(chunk_times) > 1 else np.array(chunk_times)
        med = float(np.median(ct))
        chunk_audio_s = sc.chunk / sr
        rtf = chunk_audio_s / med
        alg_latency = chunk_audio_s + sc.ctx / sr
        if mode == "incremental":
            alg_latency += sc._sfd.delay_samples / cfg.data.target_sampling_rate
        print(f"[{mode}] chunk={chunk_audio_s*1000:.0f}ms ctx={sc.ctx/sr*1000:.0f}ms "
              f"median/chunk={med*1000:.1f}ms  RTF={rtf:.1f}x  "
              f"alg_latency={alg_latency*1000:.0f}ms  produced={produced} samples")


if __name__ == "__main__":
    main()
