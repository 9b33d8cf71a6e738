"""Unit tests for parallel/mesh.py — mesh construction and the loud-failure
contract of distributed_init (VERDICT r2 item 6: a real multi-host
misconfiguration must raise, not silently degrade to single-host; the
reference crashes visibly on DDP misconfig, /root/reference/train.py:99-100).
"""

import numpy as np
import pytest

import jax

from vcvits_tpu.parallel import mesh as mesh_mod
from vcvits_tpu.parallel.mesh import distributed_init, make_mesh, shard_batch


class _FakeDistributed:
    def __init__(self, exc=None):
        self.exc = exc
        self.calls = []

    def initialize(self, **kwargs):
        self.calls.append(kwargs)
        if self.exc is not None:
            raise self.exc


def test_escape_hatch_skips_init(monkeypatch):
    fake = _FakeDistributed()
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    monkeypatch.setenv("VCVITS_NO_DISTRIBUTED", "1")
    distributed_init(coordinator_address="10.0.0.1:1234")
    assert fake.calls == []


def test_genuine_failure_raises(monkeypatch):
    fake = _FakeDistributed(RuntimeError("Barrier timed out connecting to coordinator"))
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    monkeypatch.delenv("VCVITS_NO_DISTRIBUTED", raising=False)
    with pytest.raises(RuntimeError, match="coordinator"):
        distributed_init(coordinator_address="10.0.0.1:1234", num_processes=4)


def test_already_initialized_is_benign(monkeypatch):
    fake = _FakeDistributed(RuntimeError("jax.distributed is already initialized"))
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    monkeypatch.delenv("VCVITS_NO_DISTRIBUTED", raising=False)
    distributed_init()  # must not raise
    assert len(fake.calls) == 1


def test_no_cluster_autodetect_is_benign_without_kwargs(monkeypatch):
    fake = _FakeDistributed(ValueError("Could not find a coordinator address"))
    monkeypatch.setattr(mesh_mod.jax, "distributed", fake)
    monkeypatch.delenv("VCVITS_NO_DISTRIBUTED", raising=False)
    distributed_init()  # plain single-process run: fine
    with pytest.raises(ValueError):
        distributed_init(coordinator_address="10.0.0.1:1234")


def test_make_mesh_shapes():
    m = make_mesh()  # 8 virtual devices, data-parallel
    assert m.devices.shape == (8, 1)
    m = make_mesh(model=2)
    assert m.devices.shape == (4, 2)
    with pytest.raises(AssertionError):
        make_mesh(data=3, model=2)


def test_shard_batch_places_on_data_axis():
    m = make_mesh(model=2)
    batch = {"x": np.zeros((8, 16), np.float32), "n": np.zeros((8,), np.int32)}
    out = shard_batch(batch, m)
    for v in out.values():
        assert isinstance(v, jax.Array)
        spec = v.sharding.spec
        assert spec[0] == "data"


def test_abstract_templates_match_concrete_shardings():
    """tp_template / replicated_template (the dryrun's zero-compile
    fresh-process restore path) must produce EXACTLY the shardings the
    concrete shard_params_tp / shard_replicated placers apply — a drift
    here recompiles the train step after every restore."""
    from vcvits_tpu.parallel.mesh import (
        replicated_template, shard_params_tp, shard_replicated, tp_template,
    )

    m = make_mesh(model=2)
    params = {
        "enc": {"q_proj": {"kernel": np.zeros((32, 64), np.float32),
                           "bias": np.zeros((64,), np.float32)}},
        "dec": {"big": {"kernel": np.zeros((3, 8, 512), np.float32)},
                "small": {"kernel": np.zeros((3, 8, 64), np.float32)}},
    }
    concrete = shard_params_tp(params, m)
    abstract = tp_template(params, m)
    flat_c = jax.tree_util.tree_flatten_with_path(concrete)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(abstract)[0]
    assert len(flat_c) == len(flat_a)
    tp_seen = 0
    for (pc, xc), (pa, xa) in zip(flat_c, flat_a):
        assert pc == pa
        assert isinstance(xa, jax.ShapeDtypeStruct)
        assert xa.shape == xc.shape and xa.dtype == xc.dtype
        assert xa.sharding == xc.sharding, jax.tree_util.keystr(pc)
        if "model" in str(xc.sharding.spec):
            tp_seen += 1
    assert tp_seen >= 2  # q_proj kernel/bias + wide dec conv

    opt = {"mu": np.zeros((4, 4), np.float32), "count": np.zeros((), np.int32)}
    conc = shard_replicated(opt, m)
    abst = replicated_template(opt, m)
    for k in opt:
        assert abst[k].sharding == conc[k].sharding
        assert abst[k].shape == conc[k].shape and abst[k].dtype == conc[k].dtype
