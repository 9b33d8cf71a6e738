#!/usr/bin/env python
"""Residual host-RSS leak hunt (VERDICT r3 #4).

Round 3 isolated the big leak — every h2d transfer on this tunneled TPU
client retains its payload host-side — and fixed the train path with the
device-resident dataset cache (reports/host_leak_r3.json). But the 20k
convergence run still grew ~0.6 MB/step (10.2 -> 22.8 GB over 20k steps).
The unprobed per-step/periodic paths are all device-to-host or
checkpoint-shaped:

  * metrics device_get (every log_interval)
  * TensorBoard image/audio logging
  * async Orbax checkpoint saves (full-state d2h every 2000 steps; 10
    saves x ~1.2 GB state over that run ~= the observed 12.6 GB growth,
    the prime suspect)
  * glibc arena growth that malloc_trim could return

This probes each in isolation and reports MB per event, with and without
malloc_trim(0). Writes reports/host_leak_r4.json.

  python tools/host_leak_probe_r4.py
"""

from __future__ import annotations

import ctypes
import gc
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def rss_mb() -> float:
    with open("/proc/self/statm") as f:
        pages = int(f.read().split()[1])
    return pages * os.sysconf("SC_PAGE_SIZE") / 1e6


def trim() -> float:
    """malloc_trim(0) then return RSS — distinguishes retained allocations
    from glibc arenas that were merely never returned to the kernel."""
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass
    return rss_mb()


def probe_d2h_fixed(n=40, mb=64):
    """device_get the SAME device buffer n times."""
    import jax
    import jax.numpy as jnp

    x = jnp.zeros((mb * 1024 * 1024 // 4,), jnp.float32) + 1.0
    x.block_until_ready()
    jax.device_get(x)  # warm
    r0 = rss_mb()
    for _ in range(n):
        h = jax.device_get(x)
        del h
    r1 = rss_mb()
    r2 = trim()
    return {"n": n, "mb_each": mb, "rss_growth_mb": round(r1 - r0, 1),
            "after_trim_mb": round(r2 - r0, 1),
            "mb_per_event": round((r1 - r0) / n, 2),
            "mb_per_event_trimmed": round((r2 - r0) / n, 2)}


def probe_d2h_fresh(n=40, mb=64):
    """device_get a FRESH device buffer each time (new computation output)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def make(i):
        return jnp.full((mb * 1024 * 1024 // 4,), i, jnp.float32)

    jax.device_get(make(0))  # warm
    r0 = rss_mb()
    for i in range(n):
        h = jax.device_get(make(i))
        del h
    r1 = rss_mb()
    r2 = trim()
    return {"n": n, "mb_each": mb, "rss_growth_mb": round(r1 - r0, 1),
            "after_trim_mb": round(r2 - r0, 1),
            "mb_per_event": round((r1 - r0) / n, 2),
            "mb_per_event_trimmed": round((r2 - r0) / n, 2)}


def probe_metrics_fetch(n=400):
    """Fetch a 40-scalar metrics dict per iteration (the log-interval path)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def step(i):
        return {f"m{k}": jnp.float32(i + k) for k in range(40)}

    jax.device_get(step(0))
    r0 = rss_mb()
    for i in range(n):
        m = jax.device_get(step(i))
        del m
    r1 = rss_mb()
    r2 = trim()
    return {"n": n, "rss_growth_mb": round(r1 - r0, 1),
            "after_trim_mb": round(r2 - r0, 1),
            "kb_per_event": round((r1 - r0) / n * 1024, 1)}


def probe_ckpt_saves(n=10, param_mb=192):
    """Async Orbax save of a ~param_mb device pytree, n distinct steps."""
    import jax.numpy as jnp

    from vcvits_tpu.train.checkpoint import CheckpointManager

    tree = {
        "a": jnp.zeros((param_mb * 1024 * 1024 // 8, 2), jnp.float32) + 1.0,
        "b": jnp.arange(1024, dtype=jnp.float32),
    }
    tree["a"].block_until_ready()
    d = tempfile.mkdtemp(prefix="leakprobe_ckpt_")
    mgr = CheckpointManager(d, max_to_keep=2)
    mgr.save(0, tree)
    mgr.wait()  # warm (compile/handles)
    r0 = rss_mb()
    for i in range(1, n + 1):
        mgr.save(i, tree)
        mgr.wait()
    r1 = rss_mb()
    r2 = trim()
    shutil.rmtree(d, ignore_errors=True)
    return {"n": n, "state_mb": param_mb, "rss_growth_mb": round(r1 - r0, 1),
            "after_trim_mb": round(r2 - r0, 1),
            "mb_per_save": round((r1 - r0) / n, 1),
            "mb_per_save_trimmed": round((r2 - r0) / n, 1)}


def probe_tb_logging(n=150):
    """TB image+audio summary per iteration (the validation logging path)."""
    from vcvits_tpu.utils.logging import TensorBoardLogger, mel_to_image

    d = tempfile.mkdtemp(prefix="leakprobe_tb_")
    tb = TensorBoardLogger(d)
    rng = np.random.default_rng(0)
    mel = rng.standard_normal((128, 400)).astype(np.float32)
    wav = rng.standard_normal(48000 * 4).astype(np.float32)
    tb.summarize(0, images={"m": mel_to_image(mel)}, audios={"a": wav},
                 audio_sampling_rate=48000)
    tb.flush()
    r0 = rss_mb()
    for i in range(1, n + 1):
        tb.summarize(i, scalars={"x": float(i)},
                     images={"m": mel_to_image(mel)}, audios={"a": wav},
                     audio_sampling_rate=48000)
        if i % 25 == 0:
            tb.flush()
    tb.flush()
    r1 = rss_mb()
    r2 = trim()
    tb.close()
    shutil.rmtree(d, ignore_errors=True)
    return {"n": n, "rss_growth_mb": round(r1 - r0, 1),
            "after_trim_mb": round(r2 - r0, 1),
            "mb_per_event": round((r1 - r0) / n, 2)}


def main() -> None:
    import jax

    out = {"devices": str(jax.devices()), "probes": {}}
    for name, fn in [
        ("d2h_same_buffer", probe_d2h_fixed),
        ("d2h_fresh_buffer", probe_d2h_fresh),
        ("metrics_fetch_40_scalars", probe_metrics_fetch),
        ("orbax_async_save", probe_ckpt_saves),
        ("tb_image_audio_log", probe_tb_logging),
    ]:
        print(f"probe {name}...", flush=True)
        out["probes"][name] = fn()
        print(" ", json.dumps(out["probes"][name]), flush=True)
    os.makedirs("reports", exist_ok=True)
    with open("reports/host_leak_r4.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote reports/host_leak_r4.json")


if __name__ == "__main__":
    main()
