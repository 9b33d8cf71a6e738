#!/usr/bin/env python
"""Measure the serving daemon under concurrent load on the real TPU.

VERDICT r2 ask #3: utt/s with >= 8 concurrent clients should meet or beat
the offline batched number (79.5 utt/s at B=32, BENCH_r02), with p50/p95
latency reported — the daemon's micro-batching amortizes the ~25-30 ms
tunnel sync that caps sequential serving at ~5 utt/s.

  python tools/bench_serving.py --clients 8 --seconds 20 --max-batch 32

Clients loop: submit one prepared 10 s utterance, wait for the result,
resubmit — a closed-loop load model (each client has one request in
flight), so the offered batch size ~= the client count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--max-batch", type=int, default=32)
    ap.add_argument("--window-ms", type=float, default=25.0)
    ap.add_argument("--utt-seconds", type=float, default=10.0)
    ap.add_argument("--transfer", default="f32",
                    choices=("f32", "f16", "i16", "mulaw"),
                    help="wire dtype: the ~44 MB/s tunnel makes f32 audio "
                         "transfer the serving bottleneck (i16 == PCM-16 "
                         "precision, 4x smaller; mulaw halves the output "
                         "side again, 8-bit companded)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.infer import VoiceConverter
    from vcvits_tpu.serving import ServingDaemon

    cfg = Config()
    d = cfg.data
    t_wav = int(d.source_sampling_rate * args.utt_seconds) // 2560 * 2560

    # random-init params at the production 48k size, bf16 (same scheme as
    # bench.py — no trained checkpoint exists in this environment)
    from vcvits_tpu.models.synthesizer import SynthesizerSVC

    gen = SynthesizerSVC.from_config(cfg, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    variables = jax.jit(
        lambda k: gen.init(
            {"params": k, "sample": k},
            jnp.zeros((1, t_wav)), jnp.array([t_wav]),
            jnp.zeros((1, t_wav // 320), jnp.int32), jnp.array([0]),
            method=SynthesizerSVC.infer)
    )(key)
    vc = VoiceConverter(cfg, variables["params"], dtype=jnp.bfloat16)

    r = np.random.default_rng(0)

    def make_req(seed):
        rr = np.random.default_rng(seed)
        wav = (rr.standard_normal(t_wav) * 0.05).astype(np.float32)
        pitch = rr.integers(1, cfg.model.num_pitch, t_wav // 320)
        return wav, pitch, t_wav

    reqs = [make_req(i) for i in range(args.clients)]

    daemon = ServingDaemon(vc, max_batch=args.max_batch,
                           window_ms=args.window_ms, transfer=args.transfer)

    # warm every power-of-two batch size the daemon can emit (compile
    # once, cached persistently)
    print("warming compile cache ...", flush=True)
    b = 1
    while b <= args.max_batch:
        futs = [daemon.submit(*reqs[i % len(reqs)], i % d.n_speakers)
                for i in range(b)]
        for f in futs:
            f.result(timeout=1800)
        print(f"  batch {b} ready", flush=True)
        b *= 2
    daemon.reset_stats()

    stop = threading.Event()
    completed = [0] * args.clients

    def client(ci):
        n = 0
        while not stop.is_set():
            w, p, tl = reqs[ci]
            out = daemon.submit(w, p, tl, ci % d.n_speakers).result(timeout=600)
            assert np.isfinite(out[:16]).all()
            n += 1
        completed[ci] = n

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    time.sleep(args.seconds)
    stop.set()
    for t in threads:
        t.join(timeout=600)
    elapsed = time.perf_counter() - t0

    total = sum(completed)
    stats = daemon.stats()
    daemon.close()
    out = {
        "clients": args.clients,
        "transfer": args.transfer,
        "max_batch": args.max_batch,
        "window_ms": args.window_ms,
        "utt_seconds": args.utt_seconds,
        "elapsed_s": round(elapsed, 2),
        "completed": total,
        "utt_per_s": round(total / elapsed, 2),
        "rtf_aggregate": round(total * args.utt_seconds / elapsed, 1),
        **stats,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
