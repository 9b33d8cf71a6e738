#!/usr/bin/env python
"""Decoder micro-benchmark: folded vs unfolded HiFi-GAN tail on the TPU.

Times the full-scale 48k decoder (512 initial channels, rates 8,8,4,2 —
configs/48k_base.json:54-63) for the given batch/duration, both layouts,
with honest device sync (scalar digest per call; block_until_ready returns
early over the axon tunnel). Used to publish ROADMAP item-1 numbers.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--modes", default="folded,unfolded",
                    help="comma list of folded|unfolded|phase_split|int8 "
                         "(int8 = folded + dynamic W8A8 convs)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from vcvits_tpu.config import Config
    from vcvits_tpu.models.hifigan import HiFiGANGenerator

    cfg = Config()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    t_frames = int(args.seconds * cfg.data.target_sampling_rate) // cfg.data.hop_length
    m = cfg.model
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal(
        (args.batch, t_frames, m.inter_channels)).astype(np.float32) * 0.3)
    g = jnp.asarray(r.standard_normal((args.batch, m.gin_channels)).astype(np.float32))

    results = {}
    params = None
    for mode in args.modes.split(","):
        dec = HiFiGANGenerator(
            initial_channel=m.inter_channels,
            resblock=m.resblock,
            resblock_kernel_sizes=m.resblock_kernel_sizes,
            resblock_dilation_sizes=m.resblock_dilation_sizes,
            upsample_rates=m.upsample_rates,
            upsample_initial_channel=m.upsample_initial_channel,
            upsample_kernel_sizes=m.upsample_kernel_sizes,
            gin_channels=m.gin_channels,
            fold_tail=(mode != "unfolded"),
            phase_split=(mode == "phase_split"),
            quant_int8=(mode == "int8"),
            dtype=dtype,
        )
        if params is None:
            params = jax.jit(lambda k: dec.init(k, x, g))(jax.random.PRNGKey(0))
            jax.block_until_ready(params)

        @jax.jit
        def fwd(p, x, g):
            o = dec.apply(p, x, g)
            return jnp.mean(jnp.abs(o.astype(jnp.float32)))

        try:
            d = float(fwd(params, x, g))  # compile + digest sync
        except Exception as e:
            results[mode] = {"error": str(e)[:200]}
            print(f"{mode}: FAILED {str(e)[:200]}")
            continue
        times = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(fwd(params, x, g))
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        audio_s = args.batch * t_frames * cfg.data.hop_length / cfg.data.target_sampling_rate
        results[mode] = {"ms": round(med * 1e3, 2), "rtf": round(audio_s / med, 1),
                         "digest": d}
        print(f"{mode}: {med*1e3:.1f} ms  ({audio_s/med:.0f}x RT)  digest={d:.5f}")

    modes_done = [k for k, v in results.items() if "ms" in v]
    if len(modes_done) >= 2:
        base = modes_done[0]
        for other in modes_done[1:]:
            sp = results[other]["ms"] / results[base]["ms"]
            print(f"{base} vs {other}: {sp:.2f}x")
    print(json.dumps({"batch": args.batch, "seconds": args.seconds,
                      "dtype": args.dtype, **results}))


if __name__ == "__main__":
    main()
