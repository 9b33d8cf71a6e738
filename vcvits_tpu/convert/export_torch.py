"""Export our flax params BACK to a reference-style torch checkpoint.

The inverse of convert/vcvits_torch.py: a model trained in this framework
can be handed to a user of /root/reference as a Lightning-style state dict
(`net_g.*`, `net_period_d.*`, `net_scale_d.*` keys, torch tensor layouts),
so A/B comparisons work in both directions (ROADMAP "Completeness").

Round-trip contract (tests/test_export_torch.py):
    convert_generator(export_generator(p)) == p   (bit-exact)
Weight-norm params stay (g, v) pairs (torch `weight_v`/`weight_g`); plain
convs export as `weight`; the frozen HuBERT exports under fairseq naming
(the reference loads fairseq ensembles, content_encoder.py:32).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from vcvits_tpu.config import Config

Array = np.ndarray


def _np(x) -> Array:
    return np.asarray(x, dtype=np.float32)


def _conv1d(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).transpose(2, 1, 0)
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _wn_conv1d(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight_v"] = _np(p["v"]).transpose(2, 1, 0)
    out[f"{name}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1)
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _wn_conv_transpose1d(out: Dict, name: str, p: Dict) -> None:
    # ours v [k, out, in] -> torch ConvTranspose1d weight [in, out, k]
    out[f"{name}.weight_v"] = _np(p["v"]).transpose(2, 1, 0)
    out[f"{name}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1)
    if "bias" in p:
        out[f"{name}.bias"] = _np(p["bias"])


def _wn_conv2d(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight_v"] = _np(p["v"]).transpose(3, 2, 0, 1)
    out[f"{name}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1, 1)
    out[f"{name}.bias"] = _np(p["bias"])


def _dense_to_1x1(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).T[:, :, None]
    out[f"{name}.bias"] = _np(p["bias"])


def _dense(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.weight"] = _np(p["kernel"]).T
    out[f"{name}.bias"] = _np(p["bias"])


def _layernorm(out: Dict, name: str, p: Dict) -> None:
    out[f"{name}.gamma"] = _np(p["gamma"])
    out[f"{name}.beta"] = _np(p["beta"])


def _wn_block(out: Dict, prefix: str, p: Dict) -> None:
    if "cond_layer" in p:
        _wn_conv1d(out, f"{prefix}.cond_layer", p["cond_layer"])
    i = 0
    while f"in_{i}" in p:
        _wn_conv1d(out, f"{prefix}.in_layers.{i}", p[f"in_{i}"])
        _wn_conv1d(out, f"{prefix}.res_skip_layers.{i}", p[f"res_skip_{i}"])
        i += 1


def _transformer_encoder(out: Dict, prefix: str, p: Dict) -> None:
    i = 0
    while f"attn_{i}" in p:
        attn = p[f"attn_{i}"]
        for t in ("conv_q", "conv_k", "conv_v", "conv_o"):
            _dense_to_1x1(out, f"{prefix}.attn_layers.{i}.{t}", attn[t])
        out[f"{prefix}.attn_layers.{i}.emb_rel_k"] = _np(attn["emb_rel_k"])
        out[f"{prefix}.attn_layers.{i}.emb_rel_v"] = _np(attn["emb_rel_v"])
        _layernorm(out, f"{prefix}.norm_layers_1.{i}", p[f"norm1_{i}"])
        _conv1d(out, f"{prefix}.ffn_layers.{i}.conv_1", p[f"ffn_{i}"]["conv_1"])
        _conv1d(out, f"{prefix}.ffn_layers.{i}.conv_2", p[f"ffn_{i}"]["conv_2"])
        _layernorm(out, f"{prefix}.norm_layers_2.{i}", p[f"norm2_{i}"])
        i += 1


def export_hubert_state_dict(p: Dict, prefix: str = "") -> Dict[str, Array]:
    """Flax HubertModel params -> fairseq-named flat state dict (the naming
    convert_hubert_state_dict round-trips; pos_conv exports folded)."""
    out: Dict[str, Array] = {}

    def lin(name: str, q: Dict) -> None:
        out[f"{prefix}{name}.weight"] = _np(q["kernel"]).T
        out[f"{prefix}{name}.bias"] = _np(q["bias"])

    def ln(name: str, q: Dict) -> None:
        out[f"{prefix}{name}.weight"] = _np(q["scale"])
        out[f"{prefix}{name}.bias"] = _np(q["bias"])

    fe = p["feature_extractor"]
    i = 0
    while f"conv_{i}_kernel" in fe:
        out[f"{prefix}feature_extractor.conv_layers.{i}.0.weight"] = (
            _np(fe[f"conv_{i}_kernel"]).transpose(2, 1, 0))
        if f"conv_{i}_bias" in fe:
            out[f"{prefix}feature_extractor.conv_layers.{i}.0.bias"] = (
                _np(fe[f"conv_{i}_bias"]))
        i += 1
    ln("feature_extractor.conv_layers.0.2", fe["group_norm"])
    ln("layer_norm", p["feat_ln"])
    lin("post_extract_proj", p["post_extract_proj"])
    out[f"{prefix}encoder.pos_conv.0.weight"] = (
        _np(p["pos_conv"]["kernel"]).transpose(2, 1, 0))
    out[f"{prefix}encoder.pos_conv.0.bias"] = _np(p["pos_conv"]["bias"])
    ln("encoder.layer_norm", p["encoder_ln"])
    i = 0
    while f"layer_{i}" in p:
        lay = p[f"layer_{i}"]
        base = f"encoder.layers.{i}"
        for t in ("q_proj", "k_proj", "v_proj", "out_proj"):
            lin(f"{base}.self_attn.{t}", lay["attn"][t])
        ln(f"{base}.self_attn_layer_norm", lay["ln1"])
        lin(f"{base}.fc1", lay["fc1"])
        lin(f"{base}.fc2", lay["fc2"])
        ln(f"{base}.final_layer_norm", lay["ln2"])
        i += 1
    return out


def export_generator(g_params: Dict, cfg: Config) -> Dict[str, Array]:
    """Flax SynthesizerSVC g_params -> `net_g.`-less torch state dict
    (caller prefixes). Inverse of convert_generator."""
    m = cfg.model
    out: Dict[str, Array] = {}

    enc_p = g_params["enc_p"]
    if "hubert" in enc_p:
        out.update(export_hubert_state_dict(enc_p["hubert"], "enc_p.hubert."))
    _dense(out, "enc_p.hubert_proj", enc_p["hubert_proj"])
    out["enc_p.emb_pitch.weight"] = _np(enc_p["emb_pitch"]["embedding"])
    _transformer_encoder(out, "enc_p.encoder", enc_p["encoder"])
    _conv1d(out, "enc_p.proj", enc_p["proj"])

    q = g_params["enc_q"]
    _conv1d(out, "enc_q.pre", q["pre"])
    _wn_block(out, "enc_q.enc", q["enc"])
    _conv1d(out, "enc_q.proj", q["proj"])

    i = 0
    while f"flow_{i}" in g_params["flow"]:
        f = g_params["flow"][f"flow_{i}"]
        _conv1d(out, f"flow.flows.{2 * i}.pre", f["pre"])
        _wn_block(out, f"flow.flows.{2 * i}.enc", f["enc"])
        _conv1d(out, f"flow.flows.{2 * i}.post", f["post"])
        i += 1

    if "emb_g" in g_params:
        out["emb_g.weight"] = _np(g_params["emb_g"]["embedding"])

    dec = g_params.get("dec")
    if dec is not None:
        _wn_conv1d(out, "dec.conv_pre", dec["conv_pre"])
        num_kernels = len(m.resblock_kernel_sizes)
        for i in range(len(m.upsample_rates)):
            _wn_conv_transpose1d(out, f"dec.ups.{i}", dec[f"up_{i}"])
            for j in range(num_kernels):
                rb = f"dec.resblocks.{i * num_kernels + j}"
                blk = dec[f"res_{i}_{j}"]
                if m.resblock == "1":
                    t = 0
                    while f"c1_{t}" in blk:
                        _wn_conv1d(out, f"{rb}.convs1.{t}", blk[f"c1_{t}"])
                        _wn_conv1d(out, f"{rb}.convs2.{t}", blk[f"c2_{t}"])
                        t += 1
                else:
                    t = 0
                    while f"c_{t}" in blk:
                        _wn_conv1d(out, f"{rb}.convs.{t}", blk[f"c_{t}"])
                        t += 1
        _wn_conv1d(out, "dec.conv_post", dec["conv_post"])
        if "cond" in dec:
            _dense_to_1x1(out, "dec.cond", dec["cond"])
    return out


def export_discriminators(d_params: Dict, cfg: Config) -> Dict[str, Array]:
    """{"mpd","msd"} flax trees -> net_period_d./net_scale_d. state dict."""
    out: Dict[str, Array] = {}

    def disc_s(prefix: str, p: Dict) -> None:
        for i in range(6):
            _wn_conv1d(out, f"{prefix}.convs.{i}", p[f"conv_{i}"])
        _wn_conv1d(out, f"{prefix}.conv_post", p["conv_post"])

    def disc_p(prefix: str, p: Dict) -> None:
        for i in range(5):
            _wn_conv2d(out, f"{prefix}.convs.{i}", p[f"conv_{i}"])
        _wn_conv2d(out, f"{prefix}.conv_post", p["conv_post"])

    mpd = d_params["mpd"]
    disc_s("net_period_d.discriminators.0", mpd["disc_s"])
    for idx, period in enumerate(cfg.model.multi_period_discriminator_periods):
        disc_p(f"net_period_d.discriminators.{idx + 1}", mpd[f"disc_p{period}"])
    for i in range(5):
        disc_s(f"net_scale_d.discriminators.{i}", d_params["msd"][f"disc_{i}"])
    return out


def export_lightning_checkpoint(
    path: str, g_params: Dict, cfg: Config, d_params: Optional[Dict] = None
) -> Dict[str, Array]:
    """Write a torch-loadable .ckpt with Lightning-style prefixed keys."""
    import torch

    sd: Dict = {}
    for k, v in export_generator(g_params, cfg).items():
        sd[f"net_g.{k}"] = torch.from_numpy(np.ascontiguousarray(v))
    if d_params is not None:
        for k, v in export_discriminators(d_params, cfg).items():
            sd[k] = torch.from_numpy(np.ascontiguousarray(v))
    torch.save({"state_dict": sd}, path)
    return sd
