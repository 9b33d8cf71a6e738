"""End-to-end converted-checkpoint parity: torch reference graph -> converter
-> our TPU graph, deterministic inference, mel-L1 gate.

This is the harness behind the BASELINE.md gate ("mel-L1 vs PyTorch
reference checkpoint graph <= 1e-3"): a name-faithful torch replica of the
reference generator (tests/torch_ref.py) is converted with
vcvits_tpu.convert.vcvits_torch and must reproduce the same audio.
"""

import numpy as np
import pytest
import torch

from vcvits_tpu.config import Config
from vcvits_tpu.dsp.spectrogram import mel_spectrogram
from vcvits_tpu.models.hubert import HubertConfig
from vcvits_tpu.models.synthesizer import SynthesizerSVC

TINY_HUBERT = HubertConfig(
    conv_layers=((32, 10, 5), (32, 8, 8), (32, 8, 8)),
    hidden_size=32, num_layers=2, num_heads=4, intermediate_size=64,
    pos_conv_kernel=16, pos_conv_groups=4,
)

CFG = Config.from_dict({
    "train": {"segment_size": 2048},
    "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
             "n_mel_channels": 16, "n_speakers": 4},
    "model": {
        "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
        "n_heads": 2, "n_layers": 2, "kernel_size": 3, "p_dropout": 0.0,
        "hubert_channels": 32, "num_pitch": 64, "gin_channels": 4,
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
    },
})


@pytest.fixture(scope="module")
def torch_model():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    from tests.torch_ref import SynthesizerRef

    hf = HFModel(HFConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=64, conv_dim=[32, 32, 32], conv_kernel=[10, 8, 8],
        conv_stride=[5, 8, 8], num_feat_extract_layers=3,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, conv_bias=False,
    )).eval()
    torch.manual_seed(7)
    model = SynthesizerRef(
        hubert=hf, hubert_ch=32, spec_ch=CFG.data.spec_channels,
        inter=8, hidden=16, filter_channels=32, n_heads=2, n_layers=2,
        kernel_size=3, num_pitch=64, n_speakers=4, gin=4,
        rates=(8, 8, 4, 2), kernels=(16, 16, 4, 4), rk=(3,), rd=((1, 3),),
        up_init=32,
    ).eval()
    # make the zero-init coupling posts non-trivial so the flow actually mixes
    with torch.no_grad():
        for i in range(0, 8, 2):
            model.flow.flows[i].post.weight.normal_(0, 0.1)
            model.flow.flows[i].post.bias.normal_(0, 0.05)
    return model


@pytest.fixture(scope="module")
def converted(torch_model):
    from vcvits_tpu.convert.vcvits_torch import convert_generator

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    return convert_generator(sd, CFG, hubert_cfg=TINY_HUBERT)


@pytest.mark.slow
def test_e2e_inference_parity(torch_model, converted):
    import jax
    import jax.numpy as jnp

    t_wav = 5120
    g = np.random.default_rng(0)
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(t_wav) / 16000)).astype(np.float32)
    wav += 0.02 * g.standard_normal(t_wav).astype(np.float32)
    pitch = g.integers(1, 64, t_wav // 320)
    sid = 2
    ls = (48000 / 512) / 16000
    t_out = int(round(t_wav * ls))

    with torch.no_grad():
        ref = torch_model.infer_deterministic(
            torch.from_numpy(wav)[None], torch.from_numpy(pitch)[None],
            torch.tensor([sid]), t_out,
        ).numpy()[0, 0]

    ours_model = SynthesizerSVC.from_config(CFG).clone(hubert_cfg=TINY_HUBERT)
    o, y_mask, _ = ours_model.apply(
        {"params": converted},
        jnp.asarray(wav)[None], jnp.array([t_wav]), jnp.asarray(pitch)[None],
        jnp.array([sid]), noise_scale=0.0, rng=jax.random.PRNGKey(0),
        method=SynthesizerSVC.infer,
    )
    ours = np.asarray(o)[0, :, 0]

    assert ours.shape == ref.shape
    # waveform agreement
    assert np.abs(ours - ref).max() < 5e-3
    # the BASELINE gate: mel-L1 <= 1e-3
    mel_ref = np.asarray(mel_spectrogram(
        jnp.asarray(ref)[None], 1024, 16, 48000, 512, 1024))
    mel_ours = np.asarray(mel_spectrogram(
        jnp.asarray(ours)[None], 1024, 16, 48000, 512, 1024))
    mel_l1 = float(np.abs(mel_ref - mel_ours).mean())
    assert mel_l1 <= 1e-3, f"mel-L1 {mel_l1}"


def test_posterior_and_flow_parity(torch_model, converted):
    """m_q/logs_q from enc_q and the forward flow match after conversion."""
    import jax
    import jax.numpy as jnp

    g = np.random.default_rng(1)
    t_spec = 30
    spec = np.abs(g.standard_normal((1, CFG.data.spec_channels, t_spec))).astype(np.float32)
    gvec_sid = torch.tensor([1])
    mask = torch.ones(1, 1, t_spec)

    with torch.no_grad():
        gv = torch_model.emb_g(gvec_sid).unsqueeze(-1)
        m_q, logs_q = torch_model.enc_q(torch.from_numpy(spec), mask, gv)
        z = m_q  # deterministic
        z_p = torch_model.flow(z, mask, gv)

    ours_model = SynthesizerSVC.from_config(CFG).clone(hubert_cfg=TINY_HUBERT)
    bound = ours_model.bind(
        {"params": converted}, rngs={"sample": jax.random.PRNGKey(0)}
    )
    gj = bound.emb_g(jnp.array([1]))
    zj, mj, logsj, maskj = bound.enc_q(
        jnp.asarray(spec.transpose(0, 2, 1)), jnp.array([t_spec]), g=gj,
        rng=jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(np.asarray(mj), m_q.numpy().transpose(0, 2, 1), atol=2e-4)
    np.testing.assert_allclose(np.asarray(logsj), logs_q.numpy().transpose(0, 2, 1), atol=2e-4)

    zpj = bound.flow(jnp.asarray(m_q.numpy().transpose(0, 2, 1)), maskj, g=gj)
    np.testing.assert_allclose(np.asarray(zpj), z_p.numpy().transpose(0, 2, 1), atol=5e-4)
