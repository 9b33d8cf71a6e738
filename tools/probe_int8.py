#!/usr/bin/env python
"""Probe: do int8 convs actually hit the v5e's 2x int8 MXU path via XLA?

The HiFi-GAN decoder dominates inference FLOPs (reports/flops_budget.json:
decoder 735 GF of a 3.2 TF forward at train segment shapes; at full-length
inference it is the large majority). v5e peaks at ~394 TOPS int8 vs ~197
TFLOPS bf16, so an int8 decoder could be ~2x if XLA lowers
conv_general_dilated(int8, int8 -> int32) onto the int8 MXU mode. This
probe times decoder-shaped convs in bf16 vs int8 before we commit to a
quantized-inference implementation.

  python tools/probe_int8.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcvits_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def time_fn(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))  # tunnel-proof sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    print(jax.devices())
    results = {}
    # decoder-ish 1-D conv shapes, NHC: folded tail (T=5860, C=128..512)
    # and the wide early stage; kernel 3 and 11 MRF taps
    shapes = [
        ("early_k3", (8, 938, 512), 512, 3),
        ("mid_k3", (8, 7500, 256), 256, 3),
        ("mid_k11", (8, 7500, 256), 256, 11),
        ("folded_tail_k3", (8, 5860, 256), 256, 3),
    ]
    for name, (b, t, c), cout, k in shapes:
        key = jax.random.PRNGKey(0)
        xf = jax.random.normal(key, (b, t, c), jnp.bfloat16)
        wf = jax.random.normal(key, (k, c, cout), jnp.bfloat16) * 0.05
        xi = (np.asarray(xf, np.float32) * 10).astype(np.int8)
        wi = (np.asarray(wf, np.float32) * 100).astype(np.int8)
        xi, wi = jnp.asarray(xi), jnp.asarray(wi)

        @jax.jit
        def conv_bf16(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"))

        @jax.jit
        def conv_int8(x, w):
            return jax.lax.conv_general_dilated(
                x, w, (1,), "SAME",
                dimension_numbers=("NHC", "HIO", "NHC"),
                preferred_element_type=jnp.int32)

        tb = time_fn(conv_bf16, xf, wf)
        ti = time_fn(conv_int8, xi, wi)
        flops = 2.0 * b * t * c * cout * k
        results[name] = {
            "bf16_ms": round(tb * 1e3, 3),
            "int8_ms": round(ti * 1e3, 3),
            "speedup": round(tb / ti, 3),
            "bf16_tflops": round(flops / tb / 1e12, 1),
            "int8_tops": round(flops / ti / 1e12, 1),
        }
        print(name, json.dumps(results[name]))

    # int8 matmul sanity (dot should definitely hit the int8 MXU)
    m = 4096
    a8 = jnp.asarray(np.random.default_rng(0).integers(-127, 127, (m, m), np.int8))
    ab = a8.astype(jnp.bfloat16)
    t_bf = time_fn(jax.jit(lambda a: a @ a), ab)
    t_i8 = time_fn(jax.jit(
        lambda a: jax.lax.dot(a, a, preferred_element_type=jnp.int32)), a8)
    results["matmul_4096"] = {
        "bf16_ms": round(t_bf * 1e3, 3), "int8_ms": round(t_i8 * 1e3, 3),
        "speedup": round(t_bf / t_i8, 3),
        "bf16_tflops": round(2 * m**3 / t_bf / 1e12, 1),
        "int8_tops": round(2 * m**3 / t_i8 / 1e12, 1),
    }
    print("matmul_4096", json.dumps(results["matmul_4096"]))
    out = {"probe": "int8_vs_bf16", "results": results}
    os.makedirs("reports", exist_ok=True)
    with open("reports/probe_int8.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"saved": "reports/probe_int8.json"}))


if __name__ == "__main__":
    main()
