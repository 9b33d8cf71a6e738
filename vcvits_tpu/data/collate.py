"""Static-shape batch assembly (padding + bucketing) for XLA.

Capability parity with /root/reference/vits/data/collate.py:133-191
(VoiceConversionMultiSpeakerCollate: zero-pad x_wav/x_pitch/y_wav + lengths
+ sid), redesigned for TPU: batches are padded to a fixed *bucket* length
(a small, static set of shapes -> a small, static set of XLA programs)
instead of the per-batch max. Clips longer than the bucket are random-
cropped at an aligned boundary so source/pitch/target stay frame-locked.
"""

from __future__ import annotations

import math
import random
from typing import Dict, List, Sequence

import numpy as np

from vcvits_tpu.config import DataConfig


def alignment_unit(cfg: DataConfig) -> int:
    """Smallest source-sample count that keeps every stream frame-aligned:
    unit % hubert_downsample == 0 (pitch/HuBERT frames) and
    unit * tgt_sr % (src_sr * hop) == 0 (whole spec frames on the target).
    2560 for the 48k config (0.16 s)."""
    ds = cfg.hubert_downsample
    unit = ds
    while (unit * cfg.target_sampling_rate) % (cfg.source_sampling_rate * cfg.hop_length) != 0:
        unit += ds
    return unit


def bucket_lengths(cfg: DataConfig) -> List[int]:
    """Source-sample bucket sizes from cfg.length_buckets (seconds)."""
    unit = alignment_unit(cfg)
    out = []
    for seconds in cfg.length_buckets:
        samples = int(round(seconds * cfg.source_sampling_rate))
        out.append(max(unit, math.ceil(samples / unit) * unit))
    return sorted(set(out))


def pick_bucket(num_samples: int, buckets: Sequence[int]) -> int:
    for b in buckets:
        if num_samples <= b:
            return b
    return buckets[-1]


def collate(
    items: Sequence[Dict[str, np.ndarray]],
    cfg: DataConfig,
    bucket: int,
    rng: random.Random | None = None,
) -> Dict[str, np.ndarray]:
    """items -> padded batch with static shapes for source bucket `bucket`."""
    rng = rng or random
    unit = alignment_unit(cfg)
    assert bucket % unit == 0
    ratio_num = cfg.target_sampling_rate
    ratio_den = cfg.source_sampling_rate
    ds = cfg.hubert_downsample
    b = len(items)
    tx = bucket
    ty = bucket * ratio_num // ratio_den
    tp = bucket // ds

    x = np.zeros((b, tx), np.float32)
    y = np.zeros((b, ty), np.float32)
    pitch = np.ones((b, tp), np.int64)  # bin 1 == unvoiced floor
    x_lens = np.zeros((b,), np.int32)
    y_lens = np.zeros((b,), np.int32)
    sid = np.zeros((b,), np.int32)
    # preload path (preload_vc_ms.py/collate.py:5-130 capability): items may
    # carry precomputed HuBERT features, cropped frame-locked with the wav
    has_feats = "hubert_features" in items[0]
    feats = (
        np.zeros((b, tp, items[0]["hubert_features"].shape[-1]), np.float32)
        if has_feats else None
    )

    for i, item in enumerate(items):
        xw = item["x_wav"]
        yw = item["y_wav"]
        pw = item["x_pitch"]
        hw = item.get("hubert_features")
        n = len(xw)
        if n > tx:  # random aligned crop
            max_off = (n - tx) // unit
            off = rng.randint(0, max_off) * unit if max_off > 0 else 0
            xw = xw[off : off + tx]
            yw = yw[off * ratio_num // ratio_den :][: ty]
            pw = pw[off // ds :][: tp]
            if hw is not None:
                hw = hw[off // ds :][: tp]
            n = tx
        x[i, :n] = xw
        ny = min(len(yw), ty)
        y[i, :ny] = yw[:ny]
        np_ = min(len(pw), tp)
        pitch[i, :np_] = pw[:np_]
        if feats is not None and hw is not None:
            nh = min(len(hw), tp)
            feats[i, :nh] = hw[:nh]
        # keep every stream consistent with whole alignment units
        x_lens[i] = n
        y_lens[i] = ny
        sid[i] = int(item["sid"])

    out = {
        "x_wav": x,
        "x_wav_lengths": x_lens,
        "x_pitch": pitch,
        "y_wav": y,
        "y_wav_lengths": y_lens,
        "sid": sid,
    }
    if feats is not None:
        out["hubert_features"] = feats
    return out
