#!/usr/bin/env python
"""Grouped-conv formulation shootout with DATA-CHAINED timing.

The axon tunnel runtime executes independent dispatches CONCURRENTLY, so
unchained micro-benchmarks measure pipeline overlap, not op cost (a full
MSD fwd+bwd "measured" 0.37 ms walled while its profile shows 22.7 ms
device-busy). Every variant here chains iterations through a data
dependency so wall time == serial device time.

Variants per MSD layer shape (all numerically equal to the native grouped
conv, asserted before timing):
  native   lax.conv feature_group_count=G  (the r3 default)
  packed   ops/grouped_conv.py phase-packed matmul
  bgc      groups moved to the batch dim: [G*B, T, Cg] conv with
           batch_group_count=G — batch lanes 128+ instead of 32
  s2d      space-to-depth: stride-4 folded to a FREE reshape [B,T/4,4,C],
           2-D conv kernel [11,4] (3 zero taps), feature_group_count=G

  python tools/bench_grouped_variants.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.ops.grouped_conv import grouped_conv1d_packed

K, S, PAD = 41, 4, 20

# (label, T_in, cin, cout, groups) — the 4 grouped layers of scale-0;
# deeper scales are the same shapes at T/2 and T/4.
LAYERS = [
    ("conv1 16->64 g4", 16384, 16, 64, 4),
    ("conv2 64->256 g16", 4096, 64, 256, 16),
    ("conv3 256->1024 g64", 1024, 256, 1024, 64),
    ("conv4 1024->1024 g256", 256, 1024, 1024, 256),
]


def native(x, w, g):
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(S,), padding=[(PAD, PAD)],
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=g)


def packed(x, w, g):
    return grouped_conv1d_packed(x, w, stride=S, padding=(PAD, PAD), groups=g)


def bgc(x, w, g):
    b, t, c = x.shape
    cg = c // g
    # [B,T,G,Cg] -> [G,B,T,Cg] -> [G*B, T, Cg]; batch group i must be a
    # contiguous leading block and feeds output feature block i.
    xg = x.reshape(b, t, g, cg).transpose(2, 0, 1, 3).reshape(g * b, t, cg)
    y = jax.lax.conv_general_dilated(
        xg, w, window_strides=(S,), padding=[(PAD, PAD)],
        dimension_numbers=("NHC", "HIO", "NHC"), batch_group_count=g)
    return y


def s2d(x, w, g):
    b, t, c = x.shape
    k, cg, f = w.shape
    # fold stride into channels: [B, T/4, 4*C] is a FREE reshape; express
    # the k=41 s=4 conv as kernel [11 rows x 4 phases] over [B,T/4,4,C]
    # NHWC. Output row r covers input samples 4r-20 .. 4r+20; folded row
    # j phase p is sample 4(r-5+j)+p = tap 4j+p-20+20 -> tap index 4j+p.
    # Taps 0..43 with 41 real (3 zero-padded).
    xf = x.reshape(b, t // S, S, c)
    # kernel [11, 4, cg, f]: w2[j, p] = w[4j + p] for 4j+p < 41
    w2 = jnp.zeros((11 * S, cg, f), w.dtype).at[:k].set(w).reshape(11, S, cg, f)
    y = jax.lax.conv_general_dilated(
        xf, w2, window_strides=(1, 1),
        padding=[(5, 5), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=g)
    return y[:, :, 0]


def time_chained(fn, x, w, g, iters=12, bwd=False):
    if bwd:
        def loss(x, w):
            return jnp.sum(fn(x, w, g).astype(jnp.float32) ** 2) * 1e-8

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))

        @jax.jit
        def step(x, w):
            dx, dw = grad(x, w)
            return x + dx.astype(x.dtype) * 1e-6, w + dw.astype(w.dtype) * 1e-6

        x, w = step(x, w)
        jax.block_until_ready((x, w))
        t0 = time.perf_counter()
        for _ in range(iters):
            x, w = step(x, w)
        jax.block_until_ready((x, w))
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def step(x):
        y = fn(x, w, g)
        # chain: fold a cheap function of y back into x (same shape as x)
        s = jnp.sum(y.astype(jnp.float32)) * 1e-12
        return x + s.astype(x.dtype)

    x = step(x)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = step(x)
    jax.block_until_ready(x)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    b = 32
    variants = {"native": native, "packed": packed, "bgc": bgc, "s2d": s2d}
    results = {}
    for label, t, cin, cout, g in LAYERS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.standard_normal((b, t, cin)), jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal((K, cin // g, cout)) * 0.05,
                        jnp.bfloat16)
        y_ref = np.asarray(native(x, w, g), np.float32)
        row = {}
        for name, fn in variants.items():
            y = np.asarray(fn(x, w, g), np.float32)
            if y.shape != y_ref.shape or not np.allclose(y, y_ref, atol=2e-2,
                                                         rtol=2e-2):
                row[name] = {"error": "MISMATCH", "shape": list(y.shape)}
                print(label, name, "MISMATCH", flush=True)
                continue
            row[name] = {
                "fwd_ms": round(time_chained(fn, x, w, g), 3),
                "fwdbwd_ms": round(time_chained(fn, x, w, g, bwd=True), 3),
            }
            print(label, name, json.dumps(row[name]), flush=True)
        results[label] = row
    with open("reports/bench_grouped_variants.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
