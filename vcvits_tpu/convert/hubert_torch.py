"""Convert torch HuBERT checkpoints (fairseq or transformers naming) to
vcvits_tpu.models.hubert.HubertModel params.

The reference loads fairseq ensembles directly
(/root/reference/vits/model/encoders/content_encoder.py:32); this converter
provides that capability for the JAX model. It accepts a flat
{name: np.ndarray} state dict — load it however you like (torch.load on a
fairseq .pt's ["model"], or transformers HubertModel.state_dict()) — and
emits the flax params tree. Weight-normed tensors (the positional conv)
are folded to plain kernels at conversion time: the model is frozen in this
framework, so only the materialized weight matters.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from vcvits_tpu.models.hubert import HubertConfig


def _fold_weight_norm_dim2(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=2) on a conv weight [out, in, k]."""
    norm = np.sqrt((v**2).sum(axis=(0, 1), keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _is_fairseq(sd: Dict[str, np.ndarray]) -> bool:
    return any(k.startswith("encoder.layers.0.self_attn.") for k in sd)


def convert_hubert_state_dict(sd: Dict[str, np.ndarray], cfg: HubertConfig) -> Dict:
    """Flat torch state dict -> flax params for HubertModel."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    fairseq = _is_fairseq(sd)

    def lin(prefix):
        return {
            "kernel": sd[f"{prefix}.weight"].T.astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32),
        }

    def ln(prefix):
        return {
            "scale": sd[f"{prefix}.weight"].astype(np.float32),
            "bias": sd[f"{prefix}.bias"].astype(np.float32),
        }

    params: Dict = {}

    # --- conv feature extractor ---
    fe: Dict = {}
    for i in range(len(cfg.conv_layers)):
        if fairseq:
            w = sd[f"feature_extractor.conv_layers.{i}.0.weight"]
        else:
            w = sd[f"feature_extractor.conv_layers.{i}.conv.weight"]
        fe[f"conv_{i}_kernel"] = w.transpose(2, 1, 0).astype(np.float32)  # [k, in, out]
        if cfg.conv_bias:
            key = (f"feature_extractor.conv_layers.{i}.0.bias" if fairseq
                   else f"feature_extractor.conv_layers.{i}.conv.bias")
            fe[f"conv_{i}_bias"] = sd[key].astype(np.float32)
    gn_prefix = ("feature_extractor.conv_layers.0.2" if fairseq
                 else "feature_extractor.conv_layers.0.layer_norm")
    fe["group_norm"] = {
        "scale": sd[f"{gn_prefix}.weight"].astype(np.float32),
        "bias": sd[f"{gn_prefix}.bias"].astype(np.float32),
    }
    params["feature_extractor"] = fe

    # --- projection ---
    params["feat_ln"] = ln("layer_norm" if fairseq else "feature_projection.layer_norm")
    params["post_extract_proj"] = lin(
        "post_extract_proj" if fairseq else "feature_projection.projection"
    )

    # --- positional conv (weight-normed, dim=2) ---
    pc = "encoder.pos_conv.0" if fairseq else "encoder.pos_conv_embed.conv"
    if f"{pc}.weight_g" in sd:
        g, v = sd[f"{pc}.weight_g"], sd[f"{pc}.weight_v"]
        w = _fold_weight_norm_dim2(g, v)
    elif f"{pc}.parametrizations.weight.original0" in sd:
        g = sd[f"{pc}.parametrizations.weight.original0"]
        v = sd[f"{pc}.parametrizations.weight.original1"]
        w = _fold_weight_norm_dim2(g, v)
    else:
        w = sd[f"{pc}.weight"]
    params["pos_conv"] = {
        "kernel": w.transpose(2, 1, 0).astype(np.float32),
        "bias": sd[f"{pc}.bias"].astype(np.float32),
    }

    params["encoder_ln"] = ln("encoder.layer_norm")

    # --- transformer layers ---
    for i in range(cfg.num_layers):
        if fairseq:
            base = f"encoder.layers.{i}"
            attn = f"{base}.self_attn"
            layer = {
                "attn": {p: lin(f"{attn}.{p}") for p in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "ln1": ln(f"{base}.self_attn_layer_norm"),
                "fc1": lin(f"{base}.fc1"),
                "fc2": lin(f"{base}.fc2"),
                "ln2": ln(f"{base}.final_layer_norm"),
            }
        else:
            base = f"encoder.layers.{i}"
            attn = f"{base}.attention"
            layer = {
                "attn": {p: lin(f"{attn}.{p}") for p in ("q_proj", "k_proj", "v_proj", "out_proj")},
                "ln1": ln(f"{base}.layer_norm"),
                "fc1": lin(f"{base}.feed_forward.intermediate_dense"),
                "fc2": lin(f"{base}.feed_forward.output_dense"),
                "ln2": ln(f"{base}.final_layer_norm"),
            }
        params[f"layer_{i}"] = layer

    return params


def load_fairseq_checkpoint(path: str, cfg: HubertConfig) -> Dict:
    """Load a fairseq HuBERT .pt (torch pickle) and convert. Host-side."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("model", ckpt)
    sd = {k: v.numpy() for k, v in sd.items() if hasattr(v, "numpy")}
    return convert_hubert_state_dict(sd, cfg)
