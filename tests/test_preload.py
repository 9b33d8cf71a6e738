"""Preload (precomputed-HuBERT) training path — VERDICT r1 missing #1.

Parity target: /root/reference/vits/data/dataset/preload_vc_ms.py:25-181 +
preprocess.py:61-74. The key invariant: training from dumped features gives
the SAME losses as training with the live frozen HuBERT forward."""

import os
import wave

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.data.collate import collate, pick_bucket, bucket_lengths
from vcvits_tpu.data.dataset import VoiceConversionDataset
from vcvits_tpu.data.preload import PreloadVoiceConversionDataset, dump_hubert_features
from vcvits_tpu.train.state import create_train_state
from vcvits_tpu.train.step import init_params, make_train_step
from tests.test_train_step import TINY_HUBERT


@pytest.fixture(scope="module")
def cfg(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("cache"))
    return Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "steps_per_epoch": 10, "disc_time_fold": False},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 8, "cache_dir": cache,
                 "length_buckets": [0.5]},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "multi_period_discriminator_periods": [2, 3],
        },
    })


def _write_wav(path, seconds, freq, sr=16000):
    t = np.arange(int(sr * seconds)) / sr
    y = (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((y * 32767).astype(np.int16).tobytes())


@pytest.fixture(scope="module")
def corpus(cfg, tmp_path_factory):
    d = tmp_path_factory.mktemp("wavs")
    lines = []
    for i, freq in enumerate([220.0, 330.0, 440.0]):
        p = str(d / f"s{i}.wav")
        _write_wav(p, 0.45, freq)
        lines.append(f"{p}|{i}")
    fl = str(d / "train.txt")
    with open(fl, "w") as f:
        f.write("\n".join(lines))
    return fl


def test_preload_requires_dump(cfg, corpus):
    ds = PreloadVoiceConversionDataset(corpus, cfg.data)
    with pytest.raises(FileNotFoundError, match="precomputed HuBERT"):
        ds.get_item(0)


@pytest.mark.slow
def test_preload_losses_match_live(cfg, corpus):
    """Dump features with the model's own frozen HuBERT, then run one train
    step live vs preload with the same rngs: identical metrics."""
    live_ds = VoiceConversionDataset(corpus, cfg.data)
    buckets = bucket_lengths(cfg.data)
    items = [live_ds.get_item(i) for i in range(2)]
    b = pick_bucket(len(items[0]["x_wav"]), buckets)
    batch_live = {k: jnp.asarray(v) for k, v in collate(items, cfg.data, b).items()}

    g_params, d_params = init_params(cfg, jax.random.PRNGKey(0), batch_live,
                                     hubert_cfg=TINY_HUBERT)

    n = dump_hubert_features(live_ds, cfg, g_params["enc_p"]["hubert"],
                             hubert_cfg=TINY_HUBERT, batch_size=2,
                             dtype=jnp.float32)
    assert n == 3
    # idempotent: nothing re-dumped
    assert dump_hubert_features(live_ds, cfg, g_params["enc_p"]["hubert"],
                                hubert_cfg=TINY_HUBERT, dtype=jnp.float32) == 0

    pre_ds = PreloadVoiceConversionDataset(corpus, cfg.data, in_memory=True)
    pitems = [pre_ds.get_item(i) for i in range(2)]
    assert pitems[0]["hubert_features"].shape[-1] == TINY_HUBERT.hidden_size
    batch_pre = {k: jnp.asarray(v) for k, v in collate(pitems, cfg.data, b).items()}
    assert "hubert_features" in batch_pre

    state0 = create_train_state(cfg, g_params, d_params)
    step = jax.jit(make_train_step(cfg, hubert_cfg=TINY_HUBERT))

    _, m_live = step(state0, batch_live, jax.random.PRNGKey(1))
    state0b = create_train_state(cfg, g_params, d_params)
    _, m_pre = step(state0b, batch_pre, jax.random.PRNGKey(1))

    for k in ("loss/g/total", "loss/g/mel", "loss/g/kl", "loss/d/total"):
        np.testing.assert_allclose(
            float(m_pre[k]), float(m_live[k]), rtol=2e-4,
            err_msg=f"{k} differs between live and preload paths")

    # in-memory variant serves the cached item object
    assert pre_ds.get_item(0) is pre_ds.get_item(0)


def test_shift_policy_distribution(cfg, corpus):
    """The random_shift policy matches preload_vc_ms.py:94-99: p=0.3 exact
    zero plus 0.7 * 1/25 from randint(-12,12) hitting 0 — and is a
    deterministic function of (seed, epoch, index) so the loader's two
    get_item calls per item agree and resume replays identical epochs."""
    ds = PreloadVoiceConversionDataset(corpus, cfg.data, random_shift=True)
    n = 20000
    ds.set_epoch(0)
    shifts0 = [ds.sample_shift(i) for i in range(n)]
    assert all(-12 <= s <= 12 for s in shifts0)
    frac_zero = sum(s == 0 for s in shifts0) / n
    assert abs(frac_zero - (0.3 + 0.7 / 25)) < 0.02
    nonzero = [s for s in shifts0 if s != 0]
    # uniform over the remaining 24 values: each gets ~1/25 of the 0.7 mass
    for v in (-12, -1, 5, 12):
        assert abs(sum(s == v for s in nonzero) / n - 0.7 / 25) < 0.01
    # deterministic within an epoch (bucketing + assembly must agree)
    assert shifts0 == [ds.sample_shift(i) for i in range(n)]
    # epochs resample
    ds.set_epoch(1)
    shifts1 = [ds.sample_shift(i) for i in range(n)]
    assert sum(a != b for a, b in zip(shifts0, shifts1)) > n // 2


@pytest.mark.slow
def test_shift_aug_epoch_end_to_end(cfg, corpus, tmp_path):
    """Dump shift variants, run a loader epoch with the random policy: the
    shifted item's source wav/pitch differ from unshifted while the target
    stays identical (reference shifts the SOURCE side only,
    preload_vc_ms.py:52-70)."""
    from vcvits_tpu.data.loader import BucketedLoader
    from vcvits_tpu.models.hubert import HubertModel

    cache = str(tmp_path / "cache")
    base = VoiceConversionDataset(corpus, cfg.data, cache_dir=cache)
    hub = HubertModel(TINY_HUBERT)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 2640)))["params"]
    # dump a reduced shift set; policy monkeypatched to stay inside it
    assert dump_hubert_features(base, cfg, hp, hubert_cfg=TINY_HUBERT,
                                batch_size=2, dtype=jnp.float32,
                                pitch_shifts=(0, 2)) == 6
    pre = PreloadVoiceConversionDataset(corpus, cfg.data, cache_dir=cache,
                                        random_shift=True)
    pre.sample_shift = lambda idx: 2 if idx == 0 else 0  # type: ignore

    plain = pre.get_item(0, pitch_shift=0)
    shifted = pre.get_item(0)  # policy applies -> +2 st
    assert not np.allclose(shifted["x_wav"], plain["x_wav"])
    np.testing.assert_array_equal(shifted["y_wav"], plain["y_wav"])
    assert shifted["hubert_features"].shape == plain["hubert_features"].shape
    assert not np.allclose(shifted["hubert_features"], plain["hubert_features"])

    loader = BucketedLoader(pre, cfg.data, batch_size=2, drop_last=False,
                            shuffle=False)
    batches = list(loader.epoch_batches(0))
    assert batches and all("hubert_features" in b for b in batches)


def test_preload_collate_crop_keeps_features_aligned(cfg, corpus, tmp_path):
    """When the bucket crops the wav, the feature crop stays frame-locked
    with pitch (off//ds), like the aligned wav crop. Self-contained: dumps
    into its own cache with a fresh tiny HuBERT."""
    from vcvits_tpu.models.hubert import HubertModel

    cache = str(tmp_path / "cache")
    ds = VoiceConversionDataset(corpus, cfg.data, cache_dir=cache)
    hub = HubertModel(TINY_HUBERT)
    hp = hub.init(jax.random.PRNGKey(0), jnp.zeros((1, 2640)))["params"]
    assert dump_hubert_features(ds, cfg, hp, hubert_cfg=TINY_HUBERT,
                                batch_size=2, dtype=jnp.float32) == 3
    pre = PreloadVoiceConversionDataset(corpus, cfg.data, cache_dir=cache)
    item = pre.get_item(0)
    ds = cfg.data.hubert_downsample
    small = 2560  # one alignment unit < clip length
    rng = __import__("random").Random(0)
    out = collate([item], cfg.data, small, rng)
    assert out["hubert_features"].shape[1] == small // ds
    assert out["x_pitch"].shape[1] == small // ds
