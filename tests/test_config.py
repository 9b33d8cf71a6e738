import json

import pytest

from vcvits_tpu.config import Config, load_config


def test_defaults_match_48k_reference():
    cfg = Config()
    assert cfg.data.filter_length == 2048
    assert cfg.data.hop_length == 512
    assert cfg.data.spec_channels == 1025
    assert cfg.model.upsample_rates == (8, 8, 4, 2)
    assert cfg.train.segment_size == 16384
    assert len(cfg.model.multi_period_discriminator_periods) == 12


def test_load_json_roundtrip(tmp_path):
    cfg = Config()
    p = tmp_path / "c.json"
    p.write_text(json.dumps({
        "train": {"batch_size": 4, "learning_rate": 1e-4},
        "data": {"n_mel_channels": 256},
        "model": {"hidden_channels": 256, "upsample_rates": [8, 8, 4, 2]},
    }))
    loaded = load_config(str(p))
    assert loaded.train.batch_size == 4
    assert loaded.data.n_mel_channels == 256
    assert loaded.model.upsample_rates == (8, 8, 4, 2)
    assert loaded.trainer == cfg.trainer  # defaults preserved
    hash(loaded)  # frozen + tuple-ized => hashable (jit static arg)


def test_unknown_key_rejected(tmp_path):
    p = tmp_path / "c.json"
    p.write_text(json.dumps({"train": {"no_such_key": 1}}))
    with pytest.raises(ValueError, match="no_such_key"):
        load_config(str(p))
