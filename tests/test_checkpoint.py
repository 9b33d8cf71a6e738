"""Checkpoint save/restore incl. shape-tolerant partial load."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.train.checkpoint import CheckpointManager
from vcvits_tpu.train.state import GANTrainState, create_train_state


def _tiny_state(n_emb=4):
    cfg = Config.from_dict({"train": {"steps_per_epoch": 10}})
    g_params = {
        "emb_g": {"embedding": jnp.arange(n_emb * 3, dtype=jnp.float32).reshape(n_emb, 3)},
        "proj": {"kernel": jnp.ones((2, 5)), "bias": jnp.zeros(5)},
    }
    d_params = {"mpd": {"conv": {"kernel": jnp.full((3, 1, 2), 2.0)}},
                "msd": {"conv": {"kernel": jnp.full((3, 1, 2), 3.0)}}}
    return cfg, create_train_state(cfg, g_params, d_params)


def test_save_restore_roundtrip(tmp_path):
    cfg, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(5, state)
    mgr.wait()
    assert mgr.latest_step() == 5

    _, template = _tiny_state()
    restored = mgr.restore(template, 5)
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["emb_g"]["embedding"]),
        np.asarray(state.g_params["emb_g"]["embedding"]),
    )


def test_shape_tolerant_restore(tmp_path):
    cfg, state = _tiny_state(n_emb=4)
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state)
    mgr.wait()

    # grow the speaker embedding (the reference's fine-tune feature)
    _, template = _tiny_state(n_emb=8)
    restored, changed = mgr.restore_tolerant(template, 3)
    assert changed
    # mismatched leaf keeps the fresh template value
    assert restored.g_params["emb_g"]["embedding"].shape == (8, 3)
    # matching leaves come from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["proj"]["kernel"]), np.ones((2, 5))
    )
    # optimizer state was reset (fresh template's)
    assert jax.tree.structure(restored.g_opt_state) == jax.tree.structure(template.g_opt_state)


def test_exact_restore_not_flagged(tmp_path):
    cfg, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(1, state)
    mgr.wait()
    _, template = _tiny_state()
    restored, changed = mgr.restore_tolerant(template, 1)
    assert not changed


def test_restore_raw_is_numpy_and_sharding_agnostic(tmp_path):
    """restore_raw must yield host numpy leaves (not device arrays pinned to
    the save-time topology): a checkpoint saved in a CPU process must load
    in a TPU process and vice versa — plain restore(step) replays the saved
    shardings and fails with 'Device TFRT_CPU_0 was not found'."""
    cfg, state = _tiny_state()
    mgr = CheckpointManager(str(tmp_path / "ck"))
    mgr.save(3, state)
    mgr.wait()

    raw = mgr.restore_raw()  # default: latest step
    leaves = jax.tree.leaves(raw)
    assert leaves and all(isinstance(v, np.ndarray) for v in leaves)
    np.testing.assert_array_equal(
        raw["g_params"]["emb_g"]["embedding"],
        np.asarray(state.g_params["emb_g"]["embedding"]),
    )
    assert set(raw.keys()) >= {"g_params", "d_params", "step"}

    with pytest.raises(FileNotFoundError):
        CheckpointManager(str(tmp_path / "empty")).restore_raw()
