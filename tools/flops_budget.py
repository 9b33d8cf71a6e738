#!/usr/bin/env python
"""Per-component analytic FLOP budget for the production config.

Quantifies SURVEY.md §3.1's hot-loop ranking ("decoder + 18 discriminators
dominate the step") with XLA's own cost model: each component is compiled
standalone at the shapes the train step actually runs it at, and the
compiled program's ``cost_analysis()`` FLOPs are reported for the forward
and for forward+backward (``value_and_grad`` wrt params — the frozen
HuBERT contributes no backward because the content encoder already
stop-gradients it). No parameters are materialized: modules are lowered
from ``jax.eval_shape`` trees, so the tool runs in seconds on the CPU
backend and the numbers are device-independent (analytic op counts).

  python tools/flops_budget.py [--batch 16] [--secs 4]
                               [--out reports/flops_budget.json]

Shapes mirror vcvits_tpu/train/step.py: content encoder on the 16 kHz
source clip, posterior/flow on the full 48 kHz spec length, decoder on the
segment slice (segment_size/hop frames), discriminators on
(segment_size)-sample pairs with the default batch_pair concat.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
os.makedirs("/tmp/jax_test_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")

import jax.numpy as jnp
import numpy as np


def _flops(fn, *args):
    """Analytic FLOPs of fn compiled at the abstract shapes of *args."""
    shapes = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), args)
    c = jax.jit(fn).lower(*shapes).compile().cost_analysis()
    if isinstance(c, (list, tuple)):
        c = c[0]
    return float(c.get("flops", 0.0))


def _component(name, module, method, grad_wrt_params, *args, rngs=None):
    """(fwd_flops, fwd+bwd_flops) for module.method(*args)."""
    rngs = rngs or {}
    init_rngs = {"params": jax.random.PRNGKey(0), **rngs}
    variables = jax.eval_shape(
        lambda: module.init(init_rngs, *args, method=method))

    def fwd(v, *a):
        out = module.apply(v, *a, method=method,
                           rngs=rngs if rngs else None)
        leaves = [t for t in jax.tree_util.tree_leaves(out)
                  if hasattr(t, "dtype") and jnp.issubdtype(t.dtype, jnp.floating)]
        return sum(jnp.sum(t.astype(jnp.float32)) for t in leaves)

    f_fwd = _flops(fwd, variables, *args)
    f_bwd = None
    if grad_wrt_params:
        def vg(v, *a):
            val, g = jax.value_and_grad(lambda vv: fwd(vv, *a))(v)
            gsum = sum(jnp.sum(jnp.abs(t.astype(jnp.float32)))
                       for t in jax.tree_util.tree_leaves(g))
            return val + gsum
        f_bwd = _flops(vg, variables, *args)
    return f_fwd, f_bwd


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--secs", type=float, default=4.0)
    ap.add_argument("--out", default="reports/flops_budget.json")
    ap.add_argument("--phase-split", action="store_true",
                    help="budget the decoder with the dilation-phase split")
    args = ap.parse_args()

    from vcvits_tpu.config import Config
    from vcvits_tpu.models.content_encoder import HubertContentEncoder
    from vcvits_tpu.models.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)
    from vcvits_tpu.models.flow import ResidualCouplingBlock
    from vcvits_tpu.models.hifigan import HiFiGANGenerator
    from vcvits_tpu.models.posterior import PosteriorEncoder
    from vcvits_tpu.models.synthesizer import hubert_config_for

    cfg = Config()
    m = cfg.model
    d = cfg.data
    B = args.batch
    dtype = jnp.bfloat16

    t_x = int(16000 * args.secs) // 2560 * 2560          # 16 kHz source
    t_spec = t_x * 3 // d.hop_length                     # 48 kHz spec frames
    seg = cfg.train.segment_size                          # decoder slice
    seg_frames = seg // d.hop_length

    x_wav = jnp.zeros((B, t_x), jnp.float32)
    x_lens = jnp.full((B,), t_x, jnp.int32)
    x_pitch = jnp.zeros((B, t_x // 320), jnp.int32)
    y_spec = jnp.zeros((B, t_spec, d.spec_channels), jnp.float32)
    y_lens = jnp.full((B,), t_spec, jnp.int32)
    g_vec = jnp.zeros((B, m.gin_channels), jnp.float32)
    z_full = jnp.zeros((B, t_spec, m.inter_channels), jnp.float32)
    y_mask = jnp.ones((B, t_spec, 1), jnp.float32)
    z_seg = jnp.zeros((B, seg_frames, m.inter_channels), jnp.float32)
    y_pair = jnp.zeros((B, seg, 1), jnp.float32)

    comps = {}

    enc_p = HubertContentEncoder(
        hubert_cfg=hubert_config_for(m.hubert_channels),
        out_channels=m.inter_channels, hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels, n_heads=m.n_heads,
        n_layers=m.n_layers, kernel_size=m.kernel_size,
        p_dropout=m.p_dropout, num_pitch=m.num_pitch, dtype=dtype)
    comps["content_encoder(hubert+prior)"] = _component(
        "enc_p", enc_p, None, True, x_wav, x_lens, x_pitch)

    enc_q = PosteriorEncoder(d.spec_channels, m.inter_channels,
                             m.hidden_channels, 5, 1, 16,
                             gin_channels=m.gin_channels, dtype=dtype)
    comps["posterior_encoder"] = _component(
        "enc_q", enc_q, None, True, y_spec, y_lens, g_vec,
        rngs={"sample": jax.random.PRNGKey(1)})

    flow = ResidualCouplingBlock(m.inter_channels, m.hidden_channels, 5, 1, 4,
                                 gin_channels=m.gin_channels, dtype=dtype)
    comps["flow_forward"] = _component(
        "flow", flow, None, True, z_full, y_mask, g_vec)

    dec = HiFiGANGenerator(
        initial_channel=m.inter_channels, resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        gin_channels=m.gin_channels, phase_split=args.phase_split,
        dtype=dtype)
    comps["decoder(segment)"] = _component(
        "dec", dec, None, True, z_seg, g_vec)

    mpd = MultiPeriodDiscriminator(
        periods=tuple(m.multi_period_discriminator_periods), dtype=dtype)
    comps["mpd(13 heads, segment pair)"] = _component(
        "mpd", mpd, None, True, y_pair, y_pair)

    msd = MultiScaleDiscriminator(dtype=dtype)
    comps["msd(5 scales, segment pair)"] = _component(
        "msd", msd, None, True, y_pair, y_pair)

    total_f = sum(v[0] for v in comps.values())
    total_b = sum((v[1] or v[0]) for v in comps.values())
    report = {
        "batch": B, "secs": args.secs, "segment": seg, "bf16": True,
        "decoder_phase_split": args.phase_split,
        "components": {
            k: {"fwd_gflops": round(v[0] / 1e9, 1),
                "fwd_bwd_gflops": round(v[1] / 1e9, 1) if v[1] else None,
                "fwd_share_pct": round(100 * v[0] / total_f, 1),
                "fwd_bwd_share_pct": round(100 * (v[1] or v[0]) / total_b, 1)}
            for k, v in comps.items()
        },
        "total_fwd_gflops": round(total_f / 1e9, 1),
        "total_fwd_bwd_gflops": round(total_b / 1e9, 1),
        "note": ("component-level analytic FLOPs from XLA cost_analysis; "
                 "the full train step also pays the G-side backward through "
                 "D inputs and the reference-exact D-step G recompute "
                 "(train/step.py), so step totals exceed this sum"),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    w = max(len(k) for k in comps)
    print(f"{'component':{w}}  {'fwd GF':>9}  {'fwd+bwd GF':>11}  share")
    for k, v in comps.items():
        fb = v[1] or v[0]
        print(f"{k:{w}}  {v[0]/1e9:9.1f}  {fb/1e9:11.1f}  "
              f"{100 * fb / total_b:5.1f}%")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
