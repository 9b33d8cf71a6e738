#!/usr/bin/env python
"""Per-stage inference timing: HuBERT, prior encoder, flow reverse, decoder.

Times each stage as its own jitted program (honest scalar-digest sync per
call) so the ROADMAP's stage budget stays current. The sum exceeds the
fused end-to-end time (per-call sync overhead is counted once per stage),
so treat the DELTAS between stages, not the absolute sum, as the signal.

Run:  python tools/bench_stages.py [--secs 10] [--dtype bf16]
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


def _med(fn, *args, iters=12):
    import jax.numpy as jnp

    out = fn(*args)
    float(jnp.mean(jnp.abs(out[0] if isinstance(out, tuple) else out)
                   .astype(jnp.float32)))
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.mean(jnp.abs(out[0] if isinstance(out, tuple) else out)
                       .astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) * 1000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=10.0)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "fp32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.models.synthesizer import SynthesizerSVC, nearest_interp

    cfg = Config()
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    model = SynthesizerSVC.from_config(cfg, dtype=dtype)
    t_wav = int(16000 * args.secs) // 2560 * 2560
    r = np.random.default_rng(0)
    wav = jnp.asarray(r.standard_normal((1, t_wav)).astype(np.float32) * 0.05)
    lens = jnp.array([t_wav], jnp.int32)
    pitch = jnp.asarray(r.integers(1, cfg.model.num_pitch, (1, t_wav // 320)))
    sid = jnp.array([3], jnp.int32)
    key = jax.random.PRNGKey(0)
    params = jax.jit(lambda k: model.init(
        {"params": k, "sample": k}, wav, lens, pitch, sid,
        method=SynthesizerSVC.infer))(key)["params"]

    t_out = t_wav * 3 // cfg.data.hop_length * 1  # frames at 48k/512
    t_out = int(round(t_wav * (48000 / 512) / 16000))

    def enc(p, w, l, pi):
        def m(mod, w, l, pi):
            _, m_p, logs_p, _ = mod.enc_p(w, l, pi)
            return nearest_interp(m_p, t_out), nearest_interp(logs_p, t_out)
        return model.apply({"params": p}, w, l, pi, method=m)

    enc_j = jax.jit(enc)
    m_p, logs_p = enc_j(params, wav, lens, pitch)
    z_p = m_p  # noise_scale 0 equivalent
    mask = jnp.ones((1, t_out, 1), dtype)

    def flow_rev(p, z):
        def m(mod, z):
            g = mod.emb_g(sid)
            return mod.flow(z, mask, g=g, reverse=True)
        return model.apply({"params": p}, z, method=m)

    def dec(p, z):
        def m(mod, z):
            g = mod.emb_g(sid)
            return mod.dec(z, g=g)
        return model.apply({"params": p}, z, method=m)

    flow_j = jax.jit(flow_rev)
    dec_j = jax.jit(dec)
    z = flow_j(params, z_p)

    def full(p, w, l, pi, s, k):
        o, _, _ = model.apply({"params": p}, w, l, pi, s, rng=k,
                              method=SynthesizerSVC.infer)
        return o

    full_j = jax.jit(full)

    print(f"stage timings ({args.secs}s utterance, {args.dtype}, median, "
          f"each includes one host-sync):")
    print(f"  enc_p (HuBERT+prior):  {_med(enc_j, params, wav, lens, pitch):7.1f} ms")
    print(f"  flow reverse:          {_med(flow_j, params, z_p):7.1f} ms")
    print(f"  decoder:               {_med(dec_j, params, z):7.1f} ms")
    print(f"  full infer (one jit):  {_med(full_j, params, wav, lens, pitch, sid, key):7.1f} ms")


if __name__ == "__main__":
    main()
