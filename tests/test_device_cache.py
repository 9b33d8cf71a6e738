"""Device-resident dataset cache (data/device_cache.py): batch-for-batch
parity with the streaming BucketedLoader+collate path, and the Trainer's
auto gate. Motivation documented in the module: the dev tunnel leaks every
h2d staging buffer (~16 MB/step at B=16), so training batches are gathered
on device from a one-time upload."""

import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.data.device_cache import DeviceBatcher, estimate_corpus_bytes
from vcvits_tpu.data.loader import BucketedLoader


class SynthDataset:
    """In-memory dataset with the get_item contract (x/y/pitch/sid)."""

    def __init__(self, n_items=14, seed=0, sr=16000, tgt=48000, ds=320,
                 seconds=(0.3, 1.3)):
        rng = np.random.default_rng(seed)
        self.items = []
        for i in range(n_items):
            n = int(rng.uniform(*seconds) * sr)
            x = rng.standard_normal(n).astype(np.float32) * 0.1
            y = rng.standard_normal(n * tgt // sr).astype(np.float32) * 0.1
            p = rng.integers(1, 64, n // ds)
            self.items.append({"x_wav": x, "y_wav": y, "x_pitch": p,
                               "sid": i % 4})

    def __len__(self):
        return len(self.items)

    def get_item(self, idx, pitch_shift=0):
        return self.items[idx]


@pytest.fixture(scope="module")
def cfg():
    base = Config()
    import dataclasses
    return dataclasses.replace(
        base, data=dataclasses.replace(base.data, length_buckets=(0.5, 1.0, 1.5)))


def test_device_batches_match_streaming_loader(cfg):
    ds = SynthDataset()
    loader = BucketedLoader(ds, cfg.data, batch_size=4)
    batcher = DeviceBatcher(ds, cfg.data, batch_size=4)
    assert len(batcher) == len(loader)
    for epoch in (0, 1, 5):
        ref_batches = list(loader.epoch_batches(epoch))
        dev_batches = list(batcher.epoch_batches(epoch))
        assert len(ref_batches) == len(dev_batches) > 0
        for ref, dev in zip(ref_batches, dev_batches):
            assert set(dev) == set(ref)
            for k in ref:
                np.testing.assert_array_equal(
                    np.asarray(dev[k]).astype(np.asarray(ref[k]).dtype),
                    np.asarray(ref[k]), err_msg=f"epoch {epoch} key {k}")


def test_device_batches_differ_across_epochs(cfg):
    ds = SynthDataset()
    batcher = DeviceBatcher(ds, cfg.data, batch_size=4)
    b0 = [np.asarray(b["sid"]) for b in batcher.epoch_batches(0)]
    b1 = [np.asarray(b["sid"]) for b in batcher.epoch_batches(1)]
    assert any((x != y).any() for x, y in zip(b0, b1))


def test_overlong_clips_cropped_once(cfg):
    """Clips longer than the largest bucket are crop-aligned at build time;
    the batch shape still matches the largest bucket."""
    ds = SynthDataset(n_items=4, seconds=(2.0, 2.5))  # > 1.5 s top bucket
    batcher = DeviceBatcher(ds, cfg.data, batch_size=4)
    batches = list(batcher.epoch_batches(0))
    assert len(batches) == 1
    from vcvits_tpu.data.collate import bucket_lengths
    top = max(bucket_lengths(cfg.data))
    assert np.asarray(batches[0]["x_wav"]).shape == (4, top)
    assert int(np.asarray(batches[0]["x_wav_lengths"]).max()) <= top


def test_estimate_and_trainer_gate(cfg):
    ds = SynthDataset()
    est = estimate_corpus_bytes(ds, cfg.data)
    true_bytes = sum(
        np.asarray(v).nbytes
        for b in DeviceBatcher(ds, cfg.data, batch_size=4)._store.values()
        for k, v in b.items() if k in ("x_wav", "y_wav", "x_pitch"))
    # estimate within 2x of the actual resident footprint
    assert 0.5 * true_bytes <= est <= 2.0 * true_bytes


@pytest.mark.slow
def test_trainer_uses_device_cache_and_trains(tmp_path):
    """End-to-end: tiny Trainer fit with device_data_cache=on produces
    finite losses (the full leak-fix path: gather -> train_step)."""
    import dataclasses

    import jax.numpy as jnp

    from tests.test_streaming import TINY_HUBERT
    from vcvits_tpu.train.trainer import Trainer
    from vcvits_tpu.utils.audio_io import write_wav

    cfg = Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "log_interval": 1, "disc_time_fold": False,
                  "eval_interval": 10 ** 9, "checkpoint_interval": 10 ** 9,
                  "max_epochs": 1, "device_data_cache": "on"},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 4, "num_pitch": 64,
                 "length_buckets": (0.5,),
                 "cache_dir": str(tmp_path / "cache")},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.0,
            "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
        },
    })
    sr = cfg.data.source_sampling_rate
    lines = []
    rng = np.random.default_rng(0)
    for i in range(4):
        p = str(tmp_path / f"c{i}.wav")
        t = np.arange(int(sr * 0.45)) / sr
        write_wav(p, (0.3 * np.sin(2 * np.pi * (200 + 40 * i) * t)
                      + 0.01 * rng.standard_normal(len(t))).astype(np.float32),
                  sr)
        lines.append(f"{p}|{i}")
    fl = str(tmp_path / "train.txt")
    open(fl, "w").write("\n".join(lines) + "\n")

    trainer = Trainer(cfg, workdir=str(tmp_path / "logs"), dtype=jnp.float32,
                      hubert_cfg=TINY_HUBERT)
    state = trainer.fit(train_files=fl, max_steps=2)
    assert state is not None
    assert np.isfinite(float(state.step))
