#!/usr/bin/env python
"""Probe: do int8 convs actually hit the v5e's 2x int8 MXU path via XLA?

The HiFi-GAN decoder dominates inference FLOPs (reports/flops_budget.json:
decoder 735 GF of a 3.2 TF forward at train segment shapes; at full-length
inference it is the large majority). v5e peaks at ~394 TOPS int8 vs ~197
TFLOPS bf16, so an int8 decoder could be ~2x IF XLA lowers
conv_general_dilated(int8, int8 -> int32) onto the int8 MXU mode. This
probe times decoder-shaped convs in bf16 vs int8 before we commit to a
quantized-inference implementation.

Methodology: a single op here is sub-millisecond device-side while every
device sync over this tunnel costs ~26 ms, so each timed program chains
CHAIN data-dependent iterations of the op inside ONE jitted function and
pays one sync for the whole chain (same scheme as bench.py's pipelined
RTF). int8 chains requantize int32 -> int8 with a right-shift between
iterations (the shift is VPU noise next to the MXU work).

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

CHAIN = 64


def time_chain(fn, x, iters=5):
    """Median seconds per CHAINED program (one sync each)."""
    out = fn(x)
    float(jnp.sum(jnp.abs(out).astype(jnp.float32)))  # tunnel-proof sync
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(x)
        float(jnp.sum(jnp.abs(out).astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main() -> None:
    print(jax.devices())
    dev = jax.devices()[0]
    results = {}
    # decoder-ish 1-D conv shapes, NHC (cin == cout so the op chains):
    # wide early stage, mid stages, folded tail; MRF kernels 3 and 11
    shapes = [
        ("early_k3", (8, 938, 512), 3),
        ("mid_k3", (8, 7500, 256), 3),
        ("mid_k11", (8, 7500, 256), 11),
        ("tail_k3_128", (8, 46875, 128), 3),
    ]
    for name, (b, t, c), k in shapes:
        key = jax.random.PRNGKey(0)
        xf = jax.random.normal(key, (b, t, c), jnp.bfloat16)
        wf = jax.random.normal(key, (k, c, c), jnp.bfloat16) * (1.0 / c) ** 0.5
        xi = jnp.asarray((np.asarray(xf, np.float32) * 10).astype(np.int8))
        wi = jnp.asarray((np.asarray(wf, np.float32) * 64).astype(np.int8))

        @jax.jit
        def chain_bf16(x, w):
            for _ in range(CHAIN):
                x = jax.lax.conv_general_dilated(
                    x, w, (1,), "SAME",
                    dimension_numbers=("NHC", "HIO", "NHC"))
            return x

        @jax.jit
        def chain_int8(x, w):
            for _ in range(CHAIN):
                y = jax.lax.conv_general_dilated(
                    x, w, (1,), "SAME",
                    dimension_numbers=("NHC", "HIO", "NHC"),
                    preferred_element_type=jnp.int32)
                x = (y >> 7).astype(jnp.int8)  # requantize between layers
            return x

        tb = time_chain(lambda x: chain_bf16(x, wf), xf) / CHAIN
        ti = time_chain(lambda x: chain_int8(x, wi), xi) / CHAIN
        flops = 2.0 * b * t * c * c * k
        results[name] = {
            "bf16_us": round(tb * 1e6, 1),
            "int8_us": round(ti * 1e6, 1),
            "speedup": round(tb / ti, 3),
            "bf16_tflops": round(flops / tb / 1e12, 1),
            "int8_tops": round(flops / ti / 1e12, 1),
        }
        print(name, json.dumps(results[name]))

    # int8 matmul sanity (dot should definitely hit the int8 MXU)
    m = 4096
    a8 = jnp.asarray(
        np.random.default_rng(0).integers(-16, 16, (m, m), np.int8))
    ab = a8.astype(jnp.bfloat16) / 16.0

    @jax.jit
    def mm_bf16(a):
        for _ in range(CHAIN):
            a = (a @ a) * jnp.bfloat16(1.0 / m)
        return a

    @jax.jit
    def mm_int8(a):
        for _ in range(CHAIN):
            a = (jax.lax.dot(a, a, preferred_element_type=jnp.int32)
                 >> 9).astype(jnp.int8)
        return a

    t_bf = time_chain(mm_bf16, ab) / CHAIN
    t_i8 = time_chain(mm_int8, a8) / CHAIN
    results["matmul_4096"] = {
        "bf16_us": round(t_bf * 1e6, 1), "int8_us": round(t_i8 * 1e6, 1),
        "speedup": round(t_bf / t_i8, 3),
        "bf16_tflops": round(2 * m**3 / t_bf / 1e12, 1),
        "int8_tops": round(2 * m**3 / t_i8 / 1e12, 1),
    }
    print("matmul_4096", json.dumps(results["matmul_4096"]))
    out = {"probe": "int8_vs_bf16", "chain": CHAIN,
           "device": str(dev), "results": results}
    os.makedirs("reports", exist_ok=True)
    with open("reports/probe_int8.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"saved": "reports/probe_int8.json"}))


if __name__ == "__main__":
    main()
