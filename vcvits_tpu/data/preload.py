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


class PreloadVoiceConversionDataset(VoiceConversionDataset):
    """VC dataset whose items carry precomputed `hubert_features`
    ([T50, hubert_channels] fp32). Run `dump_hubert_features` first."""

    def __init__(self, *args, smooth: bool = True, in_memory: bool = False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.smooth = smooth
        self._memory: Optional[List[Dict[str, np.ndarray]]] = [] if in_memory else None

    def _feature_tag(self) -> str:
        return f"hubert_smooth{int(self.smooth)}"

    def feature_file(self, index: int, pitch_shift: int = 0) -> str:
        path, _ = self.items[index]
        shift_tag = f"_ps{pitch_shift}" if pitch_shift else ""
        key = f"{path}_{self.cfg.source_sampling_rate}{shift_tag}_{self._feature_tag()}"
        return os.path.join(self.cache_dir, hash_string(key) + ".npy")

    def get_item(self, index: int, pitch_shift: int = 0) -> Dict[str, np.ndarray]:
        if self._memory is not None and not pitch_shift and index < len(self._memory):
            return self._memory[index]
        item = super().get_item(index, pitch_shift)
        fpath = self.feature_file(index, pitch_shift)
        if not os.path.exists(fpath):
            raise FileNotFoundError(
                f"precomputed HuBERT features missing for {self.items[index][0]!r} "
                f"({fpath}); run dump_hubert_features() / train.py --preload-dump"
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
) -> int:
    """Compute + cache HuBERT features for every dataset item. Returns the
    number of files written. `hubert_params` is the frozen HuBERT subtree
    (g_params['enc_p']['hubert'] layout, or a converted fairseq checkpoint).
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

    def feature_path(index: int) -> str:
        path, _ = dataset.items[index]
        key = f"{path}_{d.source_sampling_rate}_hubert_smooth{int(smooth)}"
        return os.path.join(dataset.cache_dir, hash_string(key) + ".npy")

    from vcvits_tpu.data.collate import alignment_unit

    unit = alignment_unit(d)
    buckets = bucket_lengths(d)
    pools: Dict[int, List[int]] = {}
    pending: List[int] = [
        i for i in range(len(dataset)) if not os.path.exists(feature_path(i))
    ]
    written = 0

    def flush(padded_len: int):
        nonlocal written
        idxs = pools.get(padded_len, [])
        if not idxs:
            return
        wavs = np.zeros((len(idxs), padded_len), np.float32)
        lens = []
        for row, i in enumerate(idxs):
            xw = dataset.get_item(i)["x_wav"]
            wavs[row, : len(xw)] = xw
            lens.append(len(xw))
        # pad the batch to batch_size so each bucket compiles exactly once
        if len(idxs) < batch_size:
            wavs = np.pad(wavs, ((0, batch_size - len(idxs)), (0, 0)))
        feats = np.asarray(extract(jnp.asarray(wavs)))
        for row, i in enumerate(idxs):
            out = feats[row, : lens[row] // d.hubert_downsample]
            tmp = feature_path(i) + f".tmp{os.getpid()}"
            with open(tmp, "wb") as f:
                np.save(f, out)
            os.replace(tmp, feature_path(i))
            written += 1
            if log_every and written % log_every == 0:
                print(f"dumped {written} feature files", flush=True)
        pools[padded_len] = []

    for i in pending:
        n = len(dataset.get_item(i)["x_wav"])
        # features cover the FULL wav (collate may crop anywhere): pad to a
        # bucket when one fits, else ceil to the alignment unit (rare long
        # clips compile their own program at batch 1 granularity).
        b = pick_bucket(n, buckets) if n <= buckets[-1] else -(-n // unit) * unit
        pools.setdefault(b, []).append(i)
        if len(pools[b]) == batch_size:
            flush(b)
    for b in list(pools):
        flush(b)
    return written
