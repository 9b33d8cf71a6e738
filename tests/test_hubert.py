"""JAX HuBERT parity vs transformers.HubertModel (torch CPU, random init).

No pretrained weights exist in this environment (zero egress); fidelity is
established structurally: a randomly-initialized torch HubertModel is
converted and must reproduce features to float tolerance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from vcvits_tpu.convert.hubert_torch import convert_hubert_state_dict
from vcvits_tpu.models.hubert import (
    HUBERT_BASE,
    HubertConfig,
    HubertModel,
    hubert_frames,
)

TINY = HubertConfig(
    conv_layers=((32, 10, 5), (32, 3, 2)),
    conv_bias=False,
    hidden_size=32,
    num_layers=2,
    num_heads=4,
    intermediate_size=64,
    pos_conv_kernel=16,
    pos_conv_groups=4,
)


@pytest.fixture(scope="module")
def torch_tiny():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    hf_cfg = HFConfig(
        vocab_size=10,
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        conv_dim=[c for c, _, _ in TINY.conv_layers],
        conv_kernel=[k for _, k, _ in TINY.conv_layers],
        conv_stride=[s for _, _, s in TINY.conv_layers],
        num_feat_extract_layers=len(TINY.conv_layers),
        num_conv_pos_embeddings=TINY.pos_conv_kernel,
        num_conv_pos_embedding_groups=TINY.pos_conv_groups,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        conv_bias=False,
    )
    torch.manual_seed(0)
    model = HFModel(hf_cfg).eval()
    return model


def test_hubert_parity_with_transformers(torch_tiny, rng):
    wav = rng.standard_normal((2, 800)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = torch_tiny(torch.from_numpy(wav)).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in torch_tiny.state_dict().items()}
    params = convert_hubert_state_dict(sd, TINY)
    model = HubertModel(TINY)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_hubert_frame_arithmetic():
    # reference pads wav by 40 each side => frames = len/320 (SURVEY.md §2.4)
    assert HUBERT_BASE.downsample == 320
    assert HUBERT_BASE.receptive_field == 400
    for n in [16000, 32000, 48000]:
        assert hubert_frames(n + 80) == n // 320


@pytest.mark.slow
def test_hubert_base_shapes():
    model = HubertModel(HUBERT_BASE)
    wav = jnp.zeros((1, 3280))  # 3200 + 80 pad
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    assert out.shape == (1, 10, 768)


@pytest.mark.slow
def test_hubert_full_depth_conversion_parity():
    """Full-size (12-layer / 768-ch, the exact shape of
    hubert_base_ls960.pt — reference content_encoder.py:32) conversion
    parity so drift localizes to HuBERT rather than surfacing as an e2e
    mel failure (VERDICT r3 weak #6). Depth compounds error: the tiny
    2-layer gate passes at 5e-4, so pin the 12-layer feature error too."""
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    cfg = HUBERT_BASE
    hf_cfg = HFConfig(
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        conv_dim=[c for c, _, _ in cfg.conv_layers],
        conv_kernel=[k for _, k, _ in cfg.conv_layers],
        conv_stride=[s for _, _, s in cfg.conv_layers],
        num_feat_extract_layers=len(cfg.conv_layers),
        num_conv_pos_embeddings=cfg.pos_conv_kernel,
        num_conv_pos_embedding_groups=cfg.pos_conv_groups,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        hidden_act="gelu",
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
        conv_bias=cfg.conv_bias,
    )
    torch.manual_seed(1)
    hf = HFModel(hf_cfg).eval()
    wav = np.random.default_rng(3).standard_normal((1, 4000)).astype(np.float32) * 0.1
    with torch.no_grad():
        ref = hf(torch.from_numpy(wav)).last_hidden_state.numpy()

    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = convert_hubert_state_dict(sd, cfg)
    ours = np.asarray(HubertModel(cfg).apply({"params": params}, jnp.asarray(wav)))
    assert ours.shape == ref.shape == (1, hubert_frames(4000, cfg), 768)
    mse = float(np.square(ours - ref).mean())
    ref_var = float(np.square(ref).mean())
    assert mse / ref_var < 1e-7, (mse, ref_var)
    np.testing.assert_allclose(ours, ref, atol=2e-3, rtol=1e-3)


def test_im2col_first_conv_exact():
    """ROADMAP item 2: the single-channel first conv folded into a dense
    [k -> dim] matmul (full MXU lane use) is bit-exact vs the plain conv."""
    from vcvits_tpu.models.hubert import ConvFeatureExtractor

    cfg = HUBERT_BASE
    wav = jax.random.normal(jax.random.PRNGKey(0), (2, 3200))
    folded = ConvFeatureExtractor(cfg, im2col_first=True)
    plain = ConvFeatureExtractor(cfg, im2col_first=False)
    p = folded.init(jax.random.PRNGKey(1), wav)["params"]
    y1 = folded.apply({"params": p}, wav)
    y0 = plain.apply({"params": p}, wav)
    assert y1.shape == y0.shape
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y0))
