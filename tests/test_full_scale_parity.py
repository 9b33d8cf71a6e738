"""Conversion parity at the REAL 48k production scale (VERDICT r1 weak #3 /
next-round #4): HuBERT-base 768ch/12L, inter 128, 512-channel decoder with
the full [3,7,11]x[1,3,5] MRF — the exact configs/48k_base.json graph —
through the torch replica -> converter -> JAX pipeline, mel-L1 <= 1e-3.

No pretrained checkpoint exists in this environment
(/root/reference/checkpoints is empty), so the replica is randomly
initialized at full size — the gate checks the conversion graph where
interp indexing, window sizes, and weight-norm folding have the most room
to diverge. Slow tier (one-core host: several minutes of torch + XLA-CPU
compile). The measured number is recorded in PARITY.md.
"""

import numpy as np
import pytest
import torch

from vcvits_tpu.config import Config
from vcvits_tpu.dsp.spectrogram import mel_spectrogram
from vcvits_tpu.models.hubert import HUBERT_BASE
from vcvits_tpu.models.synthesizer import SynthesizerSVC

CFG = Config()  # the real 48k config (config.py defaults == 48k_base.json)


@pytest.mark.slow
def test_full_48k_conversion_parity():
    from transformers import HubertConfig as HFConfig, HubertModel as HFModel

    from tests.torch_ref import SynthesizerRef
    from vcvits_tpu.convert.vcvits_torch import convert_generator

    import jax
    import jax.numpy as jnp

    hf = HFModel(HFConfig(
        hidden_size=768, num_hidden_layers=12, num_attention_heads=12,
        intermediate_size=3072,
        conv_dim=[512] * 7, conv_kernel=[10, 3, 3, 3, 3, 2, 2],
        conv_stride=[5, 2, 2, 2, 2, 2, 2], num_feat_extract_layers=7,
        num_conv_pos_embeddings=128, num_conv_pos_embedding_groups=16,
        feat_extract_norm="group", do_stable_layer_norm=False,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        layerdrop=0.0, conv_bias=False,
    )).eval()
    torch.manual_seed(7)
    m = CFG.model
    model = SynthesizerRef(
        hubert=hf, hubert_ch=m.hubert_channels, spec_ch=CFG.data.spec_channels,
        inter=m.inter_channels, hidden=m.hidden_channels,
        filter_channels=m.filter_channels, n_heads=m.n_heads,
        n_layers=m.n_layers, kernel_size=m.kernel_size,
        num_pitch=m.num_pitch, n_speakers=CFG.data.n_speakers,
        gin=m.gin_channels, rates=m.upsample_rates,
        kernels=m.upsample_kernel_sizes, rk=m.resblock_kernel_sizes,
        rd=m.resblock_dilation_sizes, up_init=m.upsample_initial_channel,
    ).eval()
    with torch.no_grad():
        for i in range(0, 8, 2):
            model.flow.flows[i].post.weight.normal_(0, 0.1)
            model.flow.flows[i].post.bias.normal_(0, 0.05)

    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    converted = convert_generator(sd, CFG, hubert_cfg=HUBERT_BASE)

    t_wav = 5120  # 0.32 s keeps the one-core run tractable; dims are full-size
    g = np.random.default_rng(0)
    wav = (0.3 * np.sin(2 * np.pi * 220 * np.arange(t_wav) / 16000)).astype(np.float32)
    wav += 0.02 * g.standard_normal(t_wav).astype(np.float32)
    pitch = g.integers(1, CFG.model.num_pitch, t_wav // 320)
    sid = 37
    t_out = int(round(t_wav * (48000 / 512) / 16000))

    with torch.no_grad():
        ref = model.infer_deterministic(
            torch.from_numpy(wav)[None], torch.from_numpy(pitch)[None],
            torch.tensor([sid]), t_out,
        ).numpy()[0, 0]

    ours_model = SynthesizerSVC.from_config(CFG)
    o, y_mask, _ = ours_model.apply(
        {"params": converted},
        jnp.asarray(wav)[None], jnp.array([t_wav]), jnp.asarray(pitch)[None],
        jnp.array([sid]), noise_scale=0.0, rng=jax.random.PRNGKey(0),
        method=SynthesizerSVC.infer,
    )
    ours = np.asarray(o)[0, :, 0]

    assert ours.shape == ref.shape
    wav_max = float(np.abs(ours - ref).max())
    d = CFG.data
    mel_ref = np.asarray(mel_spectrogram(
        jnp.asarray(ref)[None], d.filter_length, d.n_mel_channels,
        d.target_sampling_rate, d.hop_length, d.win_length))
    mel_ours = np.asarray(mel_spectrogram(
        jnp.asarray(ours)[None], d.filter_length, d.n_mel_channels,
        d.target_sampling_rate, d.hop_length, d.win_length))
    mel_l1 = float(np.abs(mel_ref - mel_ours).mean())
    print(f"full-48k parity: wav max-abs {wav_max:.2e}, mel-L1 {mel_l1:.2e}")
    assert mel_l1 <= 1e-3, f"mel-L1 {mel_l1}"
    assert wav_max < 5e-3
