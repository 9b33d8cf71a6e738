"""Convert reference VCVITS (PyTorch Lightning) checkpoints to our params.

Capability: a user of /root/reference can bring their trained checkpoint
(`logs/lightning_logs/version_*/checkpoints/*.ckpt`, keys like
`net_g.enc_q.enc.in_layers.0.weight_v`) to this framework. Maps every
generator tensor — HuBERT (delegated to convert_hubert_state_dict),
hubert_proj/emb_pitch, the relative-attention prior encoder, posterior WN,
residual-coupling flow, speaker embedding, HiFi-GAN decoder — and both
discriminator stacks, into the flax trees this framework's modules expect.

Weight-norm pairs (weight_g, weight_v) stay (g, v) parametrized so training
dynamics match after conversion; plain conv weights are wrapped as
v = W, g = ||W|| per output channel (identical materialized kernel).

Layout recap: torch Conv1d [out, in, k] -> ours [k, in, out];
ConvTranspose1d [in, out, k] -> ours [k, out, in]; Linear [out, in] ->
Dense kernel [in, out]; 1x1 attention convs -> Dense.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

from vcvits_tpu.config import Config
from vcvits_tpu.convert.hubert_torch import convert_hubert_state_dict
from vcvits_tpu.models.hubert import HubertConfig
from vcvits_tpu.models.synthesizer import hubert_config_for

Array = np.ndarray
SD = Dict[str, Array]


def _sub(sd: SD, prefix: str) -> SD:
    plen = len(prefix)
    return {k[plen:]: v for k, v in sd.items() if k.startswith(prefix)}


def _conv1d(sd: SD, name: str) -> Dict[str, Array]:
    """Plain torch Conv1d -> {kernel [k,in,out], bias}."""
    w = sd[f"{name}.weight"]
    out = {"kernel": w.transpose(2, 1, 0).astype(np.float32)}
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _wn_conv1d(sd: SD, name: str) -> Dict[str, Array]:
    """Weight-normed torch Conv1d -> {v [k,in,out], g [1,1,out], bias}."""
    if f"{name}.weight_v" in sd:
        v, g = sd[f"{name}.weight_v"], sd[f"{name}.weight_g"]
    elif f"{name}.parametrizations.weight.original1" in sd:
        g = sd[f"{name}.parametrizations.weight.original0"]
        v = sd[f"{name}.parametrizations.weight.original1"]
    else:  # plain conv: wrap as weight-norm with g = ||W||
        w = sd[f"{name}.weight"]
        v = w
        g = np.linalg.norm(w.reshape(w.shape[0], -1), axis=1).reshape(-1, 1, 1)
    out = {
        "v": v.transpose(2, 1, 0).astype(np.float32),
        "g": g.reshape(1, 1, -1).astype(np.float32),
    }
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _wn_conv_transpose1d(sd: SD, name: str) -> Dict[str, Array]:
    """Weight-normed torch ConvTranspose1d [in,out,k] -> {v [k,out,in], g [1,1,in], bias}."""
    if f"{name}.weight_v" in sd:
        v, g = sd[f"{name}.weight_v"], sd[f"{name}.weight_g"]
    elif f"{name}.parametrizations.weight.original1" in sd:
        g = sd[f"{name}.parametrizations.weight.original0"]
        v = sd[f"{name}.parametrizations.weight.original1"]
    else:
        w = sd[f"{name}.weight"]
        v = w
        g = np.linalg.norm(w.reshape(w.shape[0], -1), axis=1).reshape(-1, 1, 1)
    out = {
        "v": v.transpose(2, 1, 0).astype(np.float32),  # [k, out, in]
        "g": g.reshape(1, 1, -1).astype(np.float32),  # per input channel
    }
    if f"{name}.bias" in sd:
        out["bias"] = sd[f"{name}.bias"].astype(np.float32)
    return out


def _wn_conv2d(sd: SD, name: str) -> Dict[str, Array]:
    """Weight-normed torch Conv2d [out,in,kh,kw] -> {v [kh,kw,in,out], g, bias}."""
    if f"{name}.weight_v" in sd:
        v, g = sd[f"{name}.weight_v"], sd[f"{name}.weight_g"]
    else:
        w = sd[f"{name}.weight"]
        v = w
        g = np.linalg.norm(w.reshape(w.shape[0], -1), axis=1).reshape(-1, 1, 1, 1)
    return {
        "v": v.transpose(2, 3, 1, 0).astype(np.float32),
        "g": g.reshape(1, 1, 1, -1).astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _dense_from_1x1(sd: SD, name: str) -> Dict[str, Array]:
    """torch 1x1 Conv1d [out,in,1] -> Dense {kernel [in,out], bias}."""
    w = sd[f"{name}.weight"]
    return {
        "kernel": w[:, :, 0].T.astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _dense(sd: SD, name: str) -> Dict[str, Array]:
    return {
        "kernel": sd[f"{name}.weight"].T.astype(np.float32),
        "bias": sd[f"{name}.bias"].astype(np.float32),
    }


def _layernorm(sd: SD, name: str) -> Dict[str, Array]:
    return {
        "gamma": sd[f"{name}.gamma"].astype(np.float32),
        "beta": sd[f"{name}.beta"].astype(np.float32),
    }


def _wn_block(sd: SD, prefix: str, n_layers: int, has_cond: bool) -> Dict:
    out: Dict = {}
    if has_cond:
        out["cond_layer"] = _wn_conv1d(sd, f"{prefix}.cond_layer")
    for i in range(n_layers):
        out[f"in_{i}"] = _wn_conv1d(sd, f"{prefix}.in_layers.{i}")
        out[f"res_skip_{i}"] = _wn_conv1d(sd, f"{prefix}.res_skip_layers.{i}")
    return out


def _transformer_encoder(sd: SD, prefix: str, n_layers: int) -> Dict:
    out: Dict = {}
    for i in range(n_layers):
        attn = {
            p: _dense_from_1x1(sd, f"{prefix}.attn_layers.{i}.{p}")
            for p in ("conv_q", "conv_k", "conv_v", "conv_o")
        }
        attn["emb_rel_k"] = sd[f"{prefix}.attn_layers.{i}.emb_rel_k"].astype(np.float32)
        attn["emb_rel_v"] = sd[f"{prefix}.attn_layers.{i}.emb_rel_v"].astype(np.float32)
        out[f"attn_{i}"] = attn
        out[f"norm1_{i}"] = _layernorm(sd, f"{prefix}.norm_layers_1.{i}")
        out[f"ffn_{i}"] = {
            "conv_1": _conv1d(sd, f"{prefix}.ffn_layers.{i}.conv_1"),
            "conv_2": _conv1d(sd, f"{prefix}.ffn_layers.{i}.conv_2"),
        }
        out[f"norm2_{i}"] = _layernorm(sd, f"{prefix}.norm_layers_2.{i}")
    return out


def convert_generator(
    sd: SD,
    cfg: Config,
    hubert_cfg: Optional[HubertConfig] = None,
    n_flows: int = 4,
    wn_layers_q: int = 16,
) -> Dict:
    """net_g.* state dict -> flax g_params for SynthesizerSVC."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    m = cfg.model
    hubert_cfg = hubert_cfg or hubert_config_for(m.hubert_channels)

    g: Dict = {}

    # --- enc_p (content_encoder.py:13-73) ---
    enc_p: Dict = {}
    hub_sd = _sub(sd, "enc_p.hubert.")
    if hub_sd:
        enc_p["hubert"] = convert_hubert_state_dict(hub_sd, hubert_cfg)
    enc_p["hubert_proj"] = _dense(sd, "enc_p.hubert_proj")
    enc_p["emb_pitch"] = {"embedding": sd["enc_p.emb_pitch.weight"].astype(np.float32)}
    enc_p["encoder"] = _transformer_encoder(sd, "enc_p.encoder", m.n_layers)
    enc_p["proj"] = _conv1d(sd, "enc_p.proj")
    g["enc_p"] = enc_p

    # --- enc_q (posterior_encoder.py:9-39) ---
    g["enc_q"] = {
        "pre": _conv1d(sd, "enc_q.pre"),
        "enc": _wn_block(sd, "enc_q.enc", wn_layers_q, has_cond=m.gin_channels > 0),
        "proj": _conv1d(sd, "enc_q.proj"),
    }

    # --- flow (flow.py:7-37; even indices are couplings, odd are Flips) ---
    flow: Dict = {}
    for i in range(n_flows):
        p = f"flow.flows.{2 * i}"
        flow[f"flow_{i}"] = {
            "pre": _conv1d(sd, f"{p}.pre"),
            "enc": _wn_block(sd, f"{p}.enc", 4, has_cond=m.gin_channels > 0),
            "post": _conv1d(sd, f"{p}.post"),
        }
    g["flow"] = flow

    # --- speaker embedding ---
    if "emb_g.weight" in sd:
        g["emb_g"] = {"embedding": sd["emb_g.weight"].astype(np.float32)}

    # --- decoder (HiFi-GAN; hub vocoder names: conv_pre/ups/resblocks/conv_post) ---
    if "dec.conv_pre.weight_v" in sd or "dec.conv_pre.weight" in sd:
        g["dec"] = convert_hifigan_generator(sd, cfg, prefix="dec.")

    return g


def convert_hifigan_generator(sd: SD, cfg: Config, prefix: str = "") -> Dict:
    """HiFi-GAN generator state_dict -> flax `dec` params.

    ``prefix="dec."`` converts the decoder subtree of a full VCVITS
    checkpoint; ``prefix=""`` (default) converts a STANDALONE torch.hub
    vocoder checkpoint — the vtuber-plan/hifi-gan:v0.3.1 ``hifigan_48k``
    layout (``conv_pre/ups.N/resblocks.N.convs1.T/conv_post`` with
    weight-norm ``weight_g``/``weight_v`` pairs) that the reference mounts
    as its decoder at synthesizer_svc.py:59."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    m = cfg.model
    dec: Dict = {}
    dec["conv_pre"] = _wn_conv1d(sd, f"{prefix}conv_pre")
    num_kernels = len(m.resblock_kernel_sizes)
    for i in range(len(m.upsample_rates)):
        dec[f"up_{i}"] = _wn_conv_transpose1d(sd, f"{prefix}ups.{i}")
        for j in range(num_kernels):
            rb = f"{prefix}resblocks.{i * num_kernels + j}"
            blk: Dict = {}
            if m.resblock == "1":
                for t in range(len(m.resblock_dilation_sizes[j])):
                    blk[f"c1_{t}"] = _wn_conv1d(sd, f"{rb}.convs1.{t}")
                    blk[f"c2_{t}"] = _wn_conv1d(sd, f"{rb}.convs2.{t}")
            else:
                for t in range(len(m.resblock_dilation_sizes[j])):
                    blk[f"c_{t}"] = _wn_conv1d(sd, f"{rb}.convs.{t}")
            dec[f"res_{i}_{j}"] = blk
    dec["conv_post"] = _wn_conv1d(sd, f"{prefix}conv_post")
    if f"{prefix}cond.weight" in sd:
        dec["cond"] = _dense_from_1x1(sd, f"{prefix}cond")
    elif m.gin_channels > 0:
        # The hub vocoder is NOT speaker-conditioned (SURVEY.md §3.4);
        # our decoder is. A zero cond projection reproduces the hub
        # behavior exactly while keeping the capability trainable.
        dec["cond"] = {
            "kernel": np.zeros((m.gin_channels, m.upsample_initial_channel), np.float32),
            "bias": np.zeros((m.upsample_initial_channel,), np.float32),
        }
    return dec


def convert_discriminators(sd: SD, cfg: Config) -> Dict:
    """net_period_d.* / net_scale_d.* -> {"mpd": ..., "msd": ...}."""
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def disc_s(prefix: str) -> Dict:
        out = {f"conv_{i}": _wn_conv1d(sd, f"{prefix}.convs.{i}") for i in range(6)}
        out["conv_post"] = _wn_conv1d(sd, f"{prefix}.conv_post")
        return out

    def disc_p(prefix: str) -> Dict:
        out = {f"conv_{i}": _wn_conv2d(sd, f"{prefix}.convs.{i}") for i in range(5)}
        out["conv_post"] = _wn_conv2d(sd, f"{prefix}.conv_post")
        return out

    mpd: Dict = {"disc_s": disc_s("net_period_d.discriminators.0")}
    for idx, period in enumerate(cfg.model.multi_period_discriminator_periods):
        mpd[f"disc_p{period}"] = disc_p(f"net_period_d.discriminators.{idx + 1}")

    msd = {f"disc_{i}": disc_s(f"net_scale_d.discriminators.{i}") for i in range(5)}
    return {"mpd": mpd, "msd": msd}


def convert_lightning_checkpoint(
    path: str, cfg: Config, hubert_cfg: Optional[HubertConfig] = None
) -> Tuple[Dict, Optional[Dict]]:
    """Load a reference Lightning .ckpt -> (g_params, d_params or None)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    g_sd = _sub(sd, "net_g.")
    g_params = convert_generator(g_sd, cfg, hubert_cfg=hubert_cfg)
    d_params = None
    if any(k.startswith("net_period_d.") for k in sd):
        d_params = convert_discriminators(sd, cfg)
    return g_params, d_params
