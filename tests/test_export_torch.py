"""Round-trip: export our params to a torch state dict, convert back,
require bit-exact equality — both checkpoint directions work (ROADMAP
"Completeness": reference users can A/B in both directions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.convert.export_torch import (
    export_discriminators,
    export_generator,
    export_hubert_state_dict,
)
from vcvits_tpu.convert.hubert_torch import convert_hubert_state_dict
from vcvits_tpu.convert.vcvits_torch import (
    convert_discriminators,
    convert_generator,
)
from vcvits_tpu.models.hubert import HubertConfig

TINY_HUBERT = HubertConfig(
    conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),
    hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32,
    pos_conv_kernel=8, pos_conv_groups=2,
)

CFG = Config.from_dict({
    "train": {"segment_size": 2048},
    "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
             "n_mel_channels": 8, "n_speakers": 4, "num_pitch": 64},
    "model": {
        "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
        "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.0,
        "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
        "upsample_initial_channel": 32,
        "resblock_kernel_sizes": [3, 7], "resblock_dilation_sizes": [[1, 3], [1, 3]],
        "multi_period_discriminator_periods": [2, 3],
    },
})


def _assert_tree_equal(a, b, path=""):
    assert set(a.keys()) == set(b.keys()), \
        f"{path}: {sorted(a.keys())} != {sorted(b.keys())}"
    for k in a:
        if isinstance(a[k], dict):
            _assert_tree_equal(a[k], b[k], f"{path}/{k}")
        else:
            np.testing.assert_array_equal(
                np.asarray(a[k], np.float32), np.asarray(b[k], np.float32),
                err_msg=f"{path}/{k}")


@pytest.mark.slow
def test_generator_roundtrip():
    from vcvits_tpu.models.synthesizer import SynthesizerSVC

    gen = SynthesizerSVC.from_config(CFG).clone(hubert_cfg=TINY_HUBERT)
    t = 5120
    t_spec = t * CFG.data.target_sampling_rate // (
        CFG.data.source_sampling_rate * CFG.data.hop_length)
    k = jax.random.PRNGKey(0)
    # training forward instantiates every submodule (enc_p/enc_q/flow/dec)
    variables = gen.init(
        {"params": k, "sample": k},
        jnp.zeros((1, t)), jnp.array([t]), jnp.zeros((1, t // 320), jnp.int32),
        jnp.zeros((1, t_spec, CFG.data.spec_channels)), jnp.array([t_spec]),
        jnp.array([0]),
    )
    g_params = jax.tree.map(np.asarray, variables["params"])
    sd = export_generator(g_params, CFG)
    back = convert_generator(sd, CFG, hubert_cfg=TINY_HUBERT)
    _assert_tree_equal(g_params, back)


def test_hubert_roundtrip():
    from vcvits_tpu.models.hubert import HubertModel

    model = HubertModel(TINY_HUBERT)
    p = jax.tree.map(
        np.asarray,
        model.init(jax.random.PRNGKey(0), jnp.zeros((1, 2640)))["params"])
    sd = export_hubert_state_dict(p)
    back = convert_hubert_state_dict(sd, TINY_HUBERT)
    _assert_tree_equal(p, back)


@pytest.mark.slow
def test_discriminator_roundtrip():
    from vcvits_tpu.models.discriminators import (
        MultiPeriodDiscriminator, MultiScaleDiscriminator)

    wav = jnp.zeros((1, 2048, 1))
    mpd = MultiPeriodDiscriminator(
        periods=tuple(CFG.model.multi_period_discriminator_periods))
    msd = MultiScaleDiscriminator()
    d_params = {
        "mpd": jax.tree.map(np.asarray,
                            mpd.init(jax.random.PRNGKey(0), wav, wav)["params"]),
        "msd": jax.tree.map(np.asarray,
                            msd.init(jax.random.PRNGKey(1), wav, wav)["params"]),
    }
    sd = export_discriminators(d_params, CFG)
    back = convert_discriminators(sd, CFG)
    _assert_tree_equal(d_params, back)
