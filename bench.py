#!/usr/bin/env python
"""Benchmark: real-time factor of full-pipeline 48 kHz any-to-any conversion.

Runs the flagship SynthesizerSVC (full 48k config: HuBERT-base content
encoder, flow, in-repo HiFi-GAN decoder) on the real TPU chip and reports
the median RTF (seconds of 48 kHz audio produced per wall-clock second) for
single-utterance conversion of 10 s clips.

Timing is honest under the axon TPU tunnel: each iteration consumes a
scalar reduction of the output (device->host round trip), because
block_until_ready alone returns before remote execution completes there.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is vs the BASELINE.md north-star target of >= 20x real time
per chip (the reference publishes no numbers of its own — SURVEY.md §6).
"""

from __future__ import annotations

import json
import time

import os

# persistent XLA compile cache: repeat runs skip the (minutes-long) compiles
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/vcvits_tpu_xla"))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.models.synthesizer import SynthesizerSVC

    cfg = Config()
    # bf16 compute: the production serving configuration (the reference
    # trains/serves fp16 AMP — configs/48k_base.json fp16_run: true).
    model = SynthesizerSVC.from_config(cfg, dtype=jnp.bfloat16)

    dur_s = 10.0
    t_wav = int(16000 * dur_s) // 2560 * 2560
    g = np.random.default_rng(0)
    x_lens = jnp.array([t_wav], dtype=jnp.int32)
    sid = jnp.array([3], dtype=jnp.int32)

    def make_inputs(seed):
        r = np.random.default_rng(seed)
        wav = jnp.asarray(r.standard_normal((1, t_wav)).astype(np.float32) * 0.05)
        pitch = jnp.asarray(r.integers(1, cfg.model.num_pitch, (1, t_wav // 320)))
        return wav, pitch

    key = jax.random.PRNGKey(0)
    wav0, pitch0 = make_inputs(0)
    params = jax.jit(
        lambda k: model.init({"params": k, "sample": k}, wav0, x_lens, pitch0, sid,
                             method=SynthesizerSVC.infer)
    )(key)
    jax.block_until_ready(params)

    def infer_fn(p, w, l, pi, s, k):
        o, y_mask, _ = model.apply(p, w, l, pi, s, rng=k,
                                   method=SynthesizerSVC.infer)
        # scalar digest forces full execution before the host sees a value
        return o, jnp.mean(jnp.abs(o.astype(jnp.float32)))

    infer = jax.jit(infer_fn)

    # warmup/compile (digest fetch included)
    o, digest = infer(params, wav0, x_lens, pitch0, sid, key)
    float(digest)
    audio_seconds = o.shape[1] / cfg.data.target_sampling_rate

    rtfs = []
    for i in range(20):
        wav, pitch = make_inputs(i + 1)
        k = jax.random.PRNGKey(i + 1)
        jax.block_until_ready((wav, pitch))
        t0 = time.perf_counter()
        _, digest = infer(params, wav, x_lens, pitch, sid, k)
        float(digest)  # device->host sync on a 4-byte scalar
        rtfs.append(audio_seconds / (time.perf_counter() - t0))

    value = float(np.median(rtfs))
    print(json.dumps({
        "metric": "rtf_48k_any_to_any_conversion",
        "value": round(value, 1),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(value / 20.0, 2),
    }))


if __name__ == "__main__":
    main()
