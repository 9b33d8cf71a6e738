#!/usr/bin/env python
"""Decoder MRF A/B on TPU: fused Pallas stages vs the XLA module path.

Validates numerics on chip, then times the full 48k HiFi-GAN decoder
forward with fused_mrf on/off.

Run:  python tools/bench_mrf.py [--secs 10] [--batch 1] [--dtype bf16]
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
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.models.hifigan import HiFiGANGenerator

    cfg = Config()
    m = cfg.model
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    dec = HiFiGANGenerator(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels, dtype=dtype)
    t = int(args.secs * cfg.data.target_sampling_rate) // cfg.data.hop_length
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 1),
                          (args.batch, t, m.inter_channels), dtype)
    g = jax.random.normal(jax.random.fold_in(k, 2),
                          (args.batch, m.gin_channels), dtype)
    params = dec.init(jax.random.fold_in(k, 3), x, g=g)["params"]

    plain = jax.jit(lambda p, x: dec.apply({"params": p}, x, g=g))
    fused = jax.jit(lambda p, x: dec.apply({"params": p}, x, g=g,
                                           fused_mrf=True))

    a = np.asarray(plain(params, x), np.float32)
    b = np.asarray(fused(params, x), np.float32)
    print(f"max |fused - plain| = {float(np.max(np.abs(a - b))):.3e} "
          f"(outputs are tanh-bounded; dtype {args.dtype})")

    for name, fn in (("plain", plain), ("fused", fused)):
        float(jnp.mean(jnp.abs(fn(params, x))))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(jnp.mean(jnp.abs(fn(params, x))))
            ts.append(time.perf_counter() - t0)
        print(f"[{name}] median {np.median(ts)*1000:.2f} ms decoder fwd "
              f"(B={args.batch}, {args.secs}s, {args.dtype})")


if __name__ == "__main__":
    main()
