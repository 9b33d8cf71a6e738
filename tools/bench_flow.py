#!/usr/bin/env python
"""Flow-reverse A/B on TPU: fused Pallas coupling kernel vs XLA module path.

Run:  python tools/bench_flow.py [--secs 10] [--batch 1] [--dtype bf16]
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
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.models.flow import ResidualCouplingBlock
    from vcvits_tpu.ops.flow_pallas import flow_reverse_fused

    cfg = Config()
    m = cfg.model
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    flow = ResidualCouplingBlock(m.inter_channels, m.hidden_channels, 5, 1, 4,
                                 gin_channels=m.gin_channels, dtype=dtype)
    t = int(args.secs * cfg.data.target_sampling_rate) // cfg.data.hop_length
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.fold_in(k, 1),
                          (args.batch, t, m.inter_channels), dtype)
    mask = jnp.ones((args.batch, t, 1), dtype)
    g = jax.random.normal(jax.random.fold_in(k, 2),
                          (args.batch, m.gin_channels), dtype)
    params = flow.init(jax.random.fold_in(k, 3), x, mask, g=g)["params"]

    xla = jax.jit(lambda p, x: flow.apply({"params": p}, x, mask, g=g,
                                          reverse=True))
    fused = jax.jit(lambda p, x: flow_reverse_fused(p, x, mask, g=g,
                                                    interpret=False))

    # numeric check on chip first
    a = np.asarray(xla(params, x), np.float32)
    b = np.asarray(fused(params, x), np.float32)
    err = float(np.max(np.abs(a - b)))
    print(f"max |fused - xla| = {err:.3e} (dtype {args.dtype})")

    for name, fn in (("xla", xla), ("fused", fused)):
        float(jnp.mean(jnp.abs(fn(params, x))))
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            float(jnp.mean(jnp.abs(fn(params, x))))
            ts.append(time.perf_counter() - t0)
        print(f"[{name}] median {np.median(ts)*1000:.2f} ms "
              f"(B={args.batch}, T={t} frames, {args.dtype})")


if __name__ == "__main__":
    main()
