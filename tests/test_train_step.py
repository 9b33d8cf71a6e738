"""GAN train step: runs jitted, metrics finite, params update, HuBERT frozen."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.models.hubert import HubertConfig
from vcvits_tpu.train.state import create_train_state
from vcvits_tpu.train.step import init_params, make_train_step

TINY_HUBERT = HubertConfig(
    conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),
    hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
    pos_conv_kernel=8, pos_conv_groups=2,
)


@pytest.fixture(scope="module")
def cfg():
    return Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "steps_per_epoch": 10, "disc_time_fold": False},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 8},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "multi_period_discriminator_periods": [2, 3],
        },
    })


@pytest.fixture(scope="module")
def batch():
    g = np.random.default_rng(0)
    tx, ty = 5120, 15360  # 0.32 s; ty = 3*tx (48k), 30 spec frames
    return {
        "x_wav": jnp.asarray(g.standard_normal((2, tx)).astype(np.float32) * 0.1),
        "x_wav_lengths": jnp.array([tx, tx - 640]),
        "x_pitch": jnp.asarray(g.integers(1, 64, (2, tx // 320))),
        "y_wav": jnp.asarray(g.standard_normal((2, ty)).astype(np.float32) * 0.1),
        "y_wav_lengths": jnp.array([ty, ty - 2048]),
        "sid": jnp.array([1, 5]),
    }


@pytest.mark.slow
def test_train_step_end_to_end(cfg, batch):
    g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch,
                                     hubert_cfg=TINY_HUBERT)
    state = create_train_state(cfg, g_params, d_params)
    step = jax.jit(make_train_step(cfg, hubert_cfg=TINY_HUBERT))

    state1, m1 = step(state, batch, jax.random.PRNGKey(1))
    state2, m2 = step(state1, batch, jax.random.PRNGKey(2))

    for k, v in m1.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite: {v}"
    assert int(state2.step) == 2

    # params actually moved
    moved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                         state.g_params, state1.g_params)
    assert max(jax.tree.leaves(moved)) > 0

    # frozen hubert params did NOT move
    hub0 = state.g_params["enc_p"]["hubert"]
    hub1 = state1.g_params["enc_p"]["hubert"]
    same = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        hub0, hub1)
    assert max(jax.tree.leaves(same)) == 0.0

    # discriminators moved
    dmoved = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                          state.d_params, state1.d_params)
    assert max(jax.tree.leaves(dmoved)) > 0

    # lr schedule: still epoch 0 at step 1
    np.testing.assert_allclose(float(m1["learning_rate"]), 2e-4, rtol=1e-6)


def test_lr_schedule_decays(cfg):
    from vcvits_tpu.train.state import exponential_epoch_schedule

    s = exponential_epoch_schedule(cfg)
    lr0 = float(s(0))
    lr1 = float(s(9))
    lr2 = float(s(10))  # epoch boundary at steps_per_epoch=10
    assert lr0 == lr1 == pytest.approx(2e-4)
    assert lr2 == pytest.approx(2e-4 * 0.999875)


@pytest.mark.slow  # 136 s on the 1-core host — 30% of the whole fast tier
def test_share_frozen_hubert_parity(cfg, batch):
    """share_frozen_hubert computes the frozen backbone once and injects
    the features into both generator forwards; it must be numerically
    equivalent to the unshared step (same weights, dropout-free backbone,
    train/state.py:60 optimizer mask)."""
    import dataclasses

    g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch,
                                     hubert_cfg=TINY_HUBERT)
    metrics = []
    for share in (True, False):
        cfg2 = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           share_frozen_hubert=share))
        state = create_train_state(cfg2, g_params, d_params)
        step = jax.jit(make_train_step(cfg2, hubert_cfg=TINY_HUBERT))
        state1, m1 = step(state, batch, jax.random.PRNGKey(1))
        _, m2 = step(state1, batch, jax.random.PRNGKey(2))
        metrics.append((m1, m2))
    (a1, a2), (b1, b2) = metrics
    for ka, kb in ((a1, b1), (a2, b2)):
        for k in ka:
            np.testing.assert_allclose(
                np.asarray(ka[k]), np.asarray(kb[k]), rtol=2e-4, atol=2e-5,
                err_msg=f"metric {k} diverged between shared/unshared hubert")


@pytest.mark.slow
def test_d_recompute_forward_variant(cfg, batch):
    """Reference-exact D-step semantics (vcvits.py:151-183): recompute the
    generator with post-update weights + fresh slices for the D loss."""
    import dataclasses

    cfg2 = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, d_recompute_forward=True))
    g_params, d_params = init_params(cfg2, jax.random.PRNGKey(0), batch,
                                     hubert_cfg=TINY_HUBERT)
    state = create_train_state(cfg2, g_params, d_params)
    step = jax.jit(make_train_step(cfg2, hubert_cfg=TINY_HUBERT))
    state1, m1 = step(state, batch, jax.random.PRNGKey(1))
    for k, v in m1.items():
        assert np.isfinite(np.asarray(v)).all(), f"{k} not finite: {v}"
    assert int(state1.step) == 1


@pytest.mark.slow
def test_grad_accumulation_semantics(cfg, batch):
    """trainer.accumulate_grad_batches=N (optax.MultiSteps, the reference's
    Lightning accumulate_grad_batches capability): params hold still for
    N-1 micro-steps, then apply the averaged update."""
    import dataclasses

    acc_cfg = dataclasses.replace(
        cfg, trainer=dataclasses.replace(cfg.trainer, accumulate_grad_batches=2))
    g_params, d_params = init_params(acc_cfg, jax.random.PRNGKey(0), batch,
                                     hubert_cfg=TINY_HUBERT)
    state = create_train_state(acc_cfg, g_params, d_params)
    step = jax.jit(make_train_step(acc_cfg, hubert_cfg=TINY_HUBERT))

    p0 = jax.device_get(state.g_params["enc_p"]["proj"]["kernel"])
    state1, _ = step(state, batch, jax.random.PRNGKey(1))
    p1 = jax.device_get(state1.g_params["enc_p"]["proj"]["kernel"])
    np.testing.assert_array_equal(p0, p1)  # micro-step 1: update held

    state2, _ = step(state1, batch, jax.random.PRNGKey(2))
    p2 = jax.device_get(state2.g_params["enc_p"]["proj"]["kernel"])
    assert np.abs(p2 - p1).max() > 0  # micro-step 2: accumulated update lands


@pytest.mark.slow
def test_remat_policies_are_semantics_preserving(cfg, batch):
    """cfg.train.remat_policy trades HBM for recompute FLOPs; the losses
    and resulting params must be bit-comparable to the no-remat step."""
    import dataclasses

    results = {}
    for pol in ("none", "dots", "nothing"):
        cfgp = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, remat_policy=pol))
        g_params, d_params = init_params(cfgp, jax.random.PRNGKey(0), batch,
                                         hubert_cfg=TINY_HUBERT)
        state = create_train_state(cfgp, g_params, d_params)
        step = jax.jit(make_train_step(cfgp, hubert_cfg=TINY_HUBERT))
        state1, m = step(state, batch, jax.random.PRNGKey(1))
        results[pol] = (float(m["loss/g/total"]), float(m["loss/d/total"]),
                        float(jnp.abs(state1.g_params["dec"]["conv_pre"]["v"]).sum()))
    for pol in ("dots", "nothing"):
        for a, b in zip(results["none"], results[pol]):
            np.testing.assert_allclose(a, b, rtol=2e-5,
                                       err_msg=f"remat={pol} diverged")


def test_remat_policy_validates():
    import dataclasses

    cfgp = Config.from_dict({})
    cfgp = dataclasses.replace(
        cfgp, train=dataclasses.replace(cfgp.train, remat_policy="bogus"))
    with pytest.raises(ValueError, match="remat_policy"):
        make_train_step(cfgp)
