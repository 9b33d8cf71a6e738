"""Data layer: WAV I/O round trips, resampler fidelity, dataset cache,
bucketed collate alignment."""

import os
import random

import numpy as np
import pytest

from vcvits_tpu.config import DataConfig
from vcvits_tpu.data.collate import alignment_unit, bucket_lengths, collate, pick_bucket
from vcvits_tpu.data.dataset import VoiceConversionDataset
from vcvits_tpu.data.filelist import (
    generate_filelist,
    load_filelist,
    split_filelist,
    wav_duration_seconds,
)
from vcvits_tpu.data.loader import BucketedLoader, prefetch
from vcvits_tpu.dsp.resample import resample
from vcvits_tpu.utils.audio_io import read_wav, write_wav


def _sine(freq, sr, dur, amp=0.5):
    t = np.arange(int(sr * dur)) / sr
    return (amp * np.sin(2 * np.pi * freq * t)).astype(np.float32)


@pytest.mark.parametrize("subtype,tol", [("PCM_16", 4e-5), ("PCM_24", 2e-7), ("FLOAT", 0)])
def test_wav_roundtrip(tmp_path, subtype, tol):
    y = _sine(440, 16000, 0.1)
    p = str(tmp_path / "a.wav")
    write_wav(p, y, 16000, subtype=subtype)
    back, sr = read_wav(p)
    assert sr == 16000
    assert len(back) == len(y)
    np.testing.assert_allclose(back, y, atol=max(tol, 1e-9))


def test_wav_stereo_downmix(tmp_path):
    l = _sine(440, 16000, 0.05)
    r = _sine(220, 16000, 0.05)
    p = str(tmp_path / "st.wav")
    write_wav(p, np.stack([l, r]), 16000, subtype="PCM_16")
    mono, sr = read_wav(p)
    np.testing.assert_allclose(mono, (l + r) / 2, atol=1e-4)


def test_wav_duration_probe(tmp_path):
    p = str(tmp_path / "d.wav")
    write_wav(p, _sine(440, 48000, 2.5), 48000)
    assert wav_duration_seconds(p) == pytest.approx(2.5, abs=1e-3)


@pytest.mark.parametrize("orig,new", [(44100, 16000), (16000, 48000), (48000, 16000)])
def test_resample_preserves_tone(orig, new):
    y = _sine(440, orig, 1.0)
    z = resample(y, orig, new)
    assert len(z) == int(np.ceil(len(y) * new / orig))
    # dominant frequency preserved
    spec = np.abs(np.fft.rfft(z * np.hanning(len(z))))
    peak = np.argmax(spec) * new / len(z)
    assert abs(peak - 440) < 2.0
    # amplitude preserved within a few percent
    assert abs(z[100:-100].max() - 0.5) < 0.03


def test_resample_roundtrip_identity():
    y = _sine(300, 16000, 0.5) + 0.2 * _sine(1100, 16000, 0.5)
    z = resample(resample(y, 16000, 48000), 48000, 16000)
    np.testing.assert_allclose(z[200:-200], y[200 : len(z) - 200], atol=5e-3)


@pytest.fixture
def tiny_corpus(tmp_path):
    sr = 48000
    ds = tmp_path / "dataset"
    for spk, f0 in [("alice", 220), ("bob", 150)]:
        d = ds / spk
        d.mkdir(parents=True)
        for i in range(3):
            dur = 0.5 + 0.3 * i
            write_wav(str(d / f"{i}.wav"), _sine(f0, sr, dur, 0.4), sr)
    lines = []
    for sid, spk in enumerate(["alice", "bob"]):
        for i in range(3):
            lines.append(f"{ds}/{spk}/{i}.wav|{sid}")
    fl = tmp_path / "filelist.txt"
    fl.write_text("\n".join(lines) + "\n")
    return tmp_path, str(fl)


def test_filelist_generation_and_split(tmp_path):
    ds = tmp_path / "dataset" / "spk0"
    ds.mkdir(parents=True)
    for i in range(60):
        write_wav(str(ds / f"{i}.wav"), _sine(200, 16000, 3.2), 16000)
    # one too-short clip filtered out
    write_wav(str(ds / "short.wav"), _sine(200, 16000, 0.5), 16000)
    lines, speakers = generate_filelist(str(tmp_path / "dataset"))
    assert speakers == ["spk0"]
    assert len(lines) == 60
    tr, va, te = split_filelist(lines, n_valid=5, n_test=5)
    assert len(tr) == 50 and len(va) == 5 and len(te) == 5
    assert set(tr + va + te) == set(lines)


def test_dataset_cache_and_alignment(tiny_corpus):
    tmp_path, fl = tiny_corpus
    cfg = DataConfig(cache_dir=str(tmp_path / "cache"))
    ds = VoiceConversionDataset(fl, cfg, shuffle_seed=None)
    item = ds.get_item(0)
    assert item["x_wav"].dtype == np.float32
    # pitch frames lock to source frames
    assert len(item["x_pitch"]) == len(item["x_wav"]) // 320
    # 48k target is 3x the 16k source (up to resampler rounding)
    assert abs(len(item["y_wav"]) - 3 * len(item["x_wav"])) <= 3
    # second load comes from cache and is identical
    again = ds.get_item(0)
    np.testing.assert_array_equal(item["x_wav"], again["x_wav"])
    assert len(os.listdir(str(tmp_path / "cache"))) == 3  # x_wav, y_wav, pitch for item 0


def test_collate_static_shapes(tiny_corpus):
    tmp_path, fl = tiny_corpus
    cfg = DataConfig(cache_dir=str(tmp_path / "cache"), length_buckets=(0.5, 1.0))
    unit = alignment_unit(cfg)
    assert unit == 2560
    buckets = bucket_lengths(cfg)
    assert all(b % unit == 0 for b in buckets)

    ds = VoiceConversionDataset(fl, cfg, shuffle_seed=None)
    items = [ds.get_item(i) for i in range(4)]
    b = buckets[-1]
    batch = collate(items, cfg, b, random.Random(0))
    assert batch["x_wav"].shape == (4, b)
    assert batch["y_wav"].shape == (4, b * 3)
    assert batch["x_pitch"].shape == (4, b // 320)
    assert (batch["x_wav_lengths"] <= b).all()
    # cropping keeps streams aligned for the longest item
    long_item = {"sid": 0, "x_wav": np.arange(b + 3 * unit, dtype=np.float32),
                 "x_pitch": np.ones((b + 3 * unit) // 320, np.int64),
                 "y_wav": np.zeros(3 * (b + 3 * unit), np.float32)}
    batch2 = collate([long_item], cfg, b, random.Random(1))
    assert batch2["x_wav_lengths"][0] == b
    off = batch2["x_wav"][0, 0]  # crop offset == first sample value
    assert off % unit == 0


def test_bucketed_loader_and_prefetch(tiny_corpus):
    tmp_path, fl = tiny_corpus
    cfg = DataConfig(cache_dir=str(tmp_path / "cache"), length_buckets=(0.5, 1.0))
    ds = VoiceConversionDataset(fl, cfg, shuffle_seed=None)
    loader = BucketedLoader(ds, cfg, batch_size=2, drop_last=False)
    batches = list(prefetch(loader.epoch_batches(0)))
    assert len(batches) >= 3  # 6 items, batch 2
    seen = sum(int((b["x_wav_lengths"] > 0).sum()) for b in batches)
    assert seen >= 6
    for b in batches:
        assert b["x_wav"].shape[0] == 2
