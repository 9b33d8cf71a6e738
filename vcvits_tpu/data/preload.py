"""Precomputed-HuBERT ("preload") training data path.

Capability parity with the reference's preload datasets and GPU feature
dump (/root/reference/vits/data/dataset/preload_vc_ms.py:25-181,
preprocess.py:61-74): HuBERT content features are computed once, cached on
disk next to the other dataset caches, and served with each item so the
training step skips the frozen ~95M-parameter HuBERT forward entirely.

TPU redesign:
* the dump runs the JAX HuBERT batched over length buckets (static shapes,
  one XLA program per bucket) instead of per-file GPU calls;
* features are dumped from the *smoothed* source (the train-time
  STFT->iSTFT pipeline, vcvits.py:61-62) so preload and live training see
  bit-comparable features — the reference dumps raw wav features and
  silently skips the smoothing in preload mode (set smooth=False for that
  behavior);
* an optional in-memory mode mirrors MemoryPreloadAnyVoiceConversion...
  (preload_vc_ms.py:110-181) for small corpora.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np

from vcvits_tpu.config import Config, DataConfig
from vcvits_tpu.data.dataset import VoiceConversionDataset, hash_string


#: The reference's per-epoch-item augmentation policy
#: (preload_vc_ms.py:94-99): p=0.3 no shift, else uniform over [-12, 12]
#: semitones (0 included, so the effective no-shift mass is 0.3 + 0.7/25).
SHIFT_SET = tuple(range(-12, 13))


class PreloadVoiceConversionDataset(VoiceConversionDataset):
    """VC dataset whose items carry precomputed `hubert_features`
    ([T50, hubert_channels] fp32). Run `dump_hubert_features` first.

    With ``random_shift=True`` the reference's augmentation policy
    (preload_vc_ms.py:94-99) is applied per epoch item: with p=0.3 no
    shift, else a uniform random semitone shift in [-12, 12] of the
    SOURCE side. The shift for (epoch, index) is a deterministic function
    of the seed, so the loader's two get_item calls per item (bucketing +
    batch assembly) agree, and resumed runs replay identical epochs. The
    loader advances the epoch via ``set_epoch`` (torch
    DistributedSampler-style). Shifted feature variants must be dumped
    first: ``dump_hubert_features(..., pitch_shifts=SHIFT_SET)`` /
    ``train.py --preload-dump --preload-shift-aug``.
    """

    def __init__(self, *args, smooth: bool = True, in_memory: bool = False,
                 random_shift: bool = False, shift_seed: int = 1234,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.smooth = smooth
        self.random_shift = random_shift
        self.shift_seed = shift_seed
        self._epoch = 0
        self._memory: Optional[List[Dict[str, np.ndarray]]] = [] if in_memory else None

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def sample_shift(self, index: int) -> int:
        """Reference policy, deterministic in (seed, epoch, index)."""
        import random as _random

        # str seeding is deterministic across processes (sha512-based)
        r = _random.Random(f"{self.shift_seed}:{self._epoch}:{index}")
        if r.random() < 0.3:
            return 0
        return r.randint(-12, 12)

    def _feature_tag(self) -> str:
        return f"hubert_smooth{int(self.smooth)}"

    def feature_file(self, index: int, pitch_shift: int = 0) -> str:
        path, _ = self.items[index]
        shift_tag = f"_ps{pitch_shift}" if pitch_shift else ""
        key = f"{path}_{self.cfg.source_sampling_rate}{shift_tag}_{self._feature_tag()}"
        return os.path.join(self.cache_dir, hash_string(key) + ".npy")

    def get_item(self, index: int,
                 pitch_shift: Optional[int] = None) -> Dict[str, np.ndarray]:
        if pitch_shift is None:
            pitch_shift = self.sample_shift(index) if self.random_shift else 0
        if self._memory is not None and not pitch_shift and index < len(self._memory):
            return self._memory[index]
        item = super().get_item(index, pitch_shift)
        fpath = self.feature_file(index, pitch_shift)
        if not os.path.exists(fpath):
            raise FileNotFoundError(
                f"precomputed HuBERT features missing for {self.items[index][0]!r} "
                f"(pitch_shift={pitch_shift}, {fpath}); run dump_hubert_features("
                f"pitch_shifts=...) / train.py --preload-dump"
                + (" --preload-shift-aug" if pitch_shift else "")
            )
        item["hubert_features"] = np.load(fpath)
        if self._memory is not None and not pitch_shift:
            while len(self._memory) <= index:
                self._memory.append(None)  # type: ignore[arg-type]
            self._memory[index] = item
        return item


def dump_hubert_features(
    dataset: VoiceConversionDataset,
    cfg: Config,
    hubert_params,
    hubert_cfg=None,
    batch_size: int = 8,
    smooth: bool = True,
    dtype=None,
    log_every: int = 50,
    pitch_shifts=(0,),
) -> int:
    """Compute + cache HuBERT features for every dataset item. Returns the
    number of files written. `hubert_params` is the frozen HuBERT subtree
    (g_params['enc_p']['hubert'] layout, or a converted fairseq checkpoint).
    `pitch_shifts`: semitone variants to dump (pass `SHIFT_SET` to cover
    the reference's random ±12 st augmentation policy — 25 variants/file).
    """
    import jax
    import jax.numpy as jnp

    from vcvits_tpu.data.collate import bucket_lengths, pick_bucket
    from vcvits_tpu.models.content_encoder import HUBERT_PAD
    from vcvits_tpu.models.hubert import HubertModel
    from vcvits_tpu.models.synthesizer import hubert_config_for
    from vcvits_tpu.train.audio_pipeline import smooth_source

    if dtype is None:
        dtype = jnp.bfloat16 if cfg.train.fp16_run else jnp.float32
    hcfg = hubert_cfg or hubert_config_for(cfg.model.hubert_channels)
    hubert = HubertModel(hcfg, dtype=dtype)
    d = cfg.data

    @jax.jit
    def extract(wav):
        if smooth:
            wav = smooth_source(wav, d.filter_length, d.hop_length, d.win_length)
        wav = jnp.pad(wav, ((0, 0), (HUBERT_PAD, HUBERT_PAD)))
        feats = hubert.apply({"params": hubert_params}, wav.astype(dtype))
        return feats.astype(jnp.float32)

    def feature_path(index: int, ps: int = 0) -> str:
        path, _ = dataset.items[index]
        shift_tag = f"_ps{ps}" if ps else ""
        key = f"{path}_{d.source_sampling_rate}{shift_tag}_hubert_smooth{int(smooth)}"
        return os.path.join(dataset.cache_dir, hash_string(key) + ".npy")

    from vcvits_tpu.data.collate import alignment_unit

    unit = alignment_unit(d)
    buckets = bucket_lengths(d)
    # pools hold (index, pitch_shift) jobs; the phase-vocoder shift is
    # length-preserving, so every shift variant lands in the same bucket
    # and reuses the same compiled program.
    pools: Dict[int, List[tuple]] = {}
    pending = [
        (i, ps)
        for ps in pitch_shifts
        for i in range(len(dataset))
        if not os.path.exists(feature_path(i, ps))
    ]
    written = 0

    def flush(padded_len: int):
        nonlocal written
        jobs = pools.get(padded_len, [])
        if not jobs:
            return
        wavs = np.zeros((len(jobs), padded_len), np.float32)
        lens = []
        for row, (i, ps) in enumerate(jobs):
            xw = dataset.get_item(i, ps)["x_wav"]
            wavs[row, : len(xw)] = xw
            lens.append(len(xw))
        # pad the batch to batch_size so each bucket compiles exactly once
        if len(jobs) < batch_size:
            wavs = np.pad(wavs, ((0, batch_size - len(jobs)), (0, 0)))
        feats = np.asarray(extract(jnp.asarray(wavs)))
        for row, (i, ps) in enumerate(jobs):
            out = feats[row, : lens[row] // d.hubert_downsample]
            tmp = feature_path(i, ps) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                np.save(f, out)
            os.replace(tmp, feature_path(i, ps))
            written += 1
            if log_every and written % log_every == 0:
                print(f"dumped {written} feature files", flush=True)
        pools[padded_len] = []

    for i, ps in pending:
        n = len(dataset.get_item(i, ps)["x_wav"])
        # features cover the FULL wav (collate may crop anywhere): pad to a
        # bucket when one fits, else ceil to the alignment unit (rare long
        # clips compile their own program at batch 1 granularity).
        b = pick_bucket(n, buckets) if n <= buckets[-1] else -(-n // unit) * unit
        pools.setdefault(b, []).append((i, ps))
        if len(pools[b]) == batch_size:
            flush(b)
    for b in list(pools):
        flush(b)
    return written
