"""Voice-conversion dataset with an on-disk feature cache.

Capability parity with /root/reference/vits/data/dataset/vc_ms.py:28-101
(VoiceConversionMultiSpeakerDataset): per item, load wav, resample to the
16 kHz source and 48 kHz target rates, pYIN pitch -> coarse bins, all
cached under md5-keyed files in cache_dir. Differences: .npz instead of
torch .pt; the preprocess fan-out is a plain function here (the reference's
train.py:75 calls get_item with a phantom second argument and crashes —
SURVEY.md §2.2 defect, fixed by construction).
"""

from __future__ import annotations

import hashlib
import os
import random
from typing import Dict, List, Optional, Tuple

import numpy as np

from vcvits_tpu.config import DataConfig
from vcvits_tpu.data.filelist import load_filelist
from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
from vcvits_tpu.dsp.resample import resample
from vcvits_tpu.utils.audio_io import read_wav


def hash_string(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


class VoiceConversionDataset:
    """Indexable host-side dataset; items are dicts of NumPy arrays."""

    def __init__(self, filelist_path: str, cfg: DataConfig, cache_dir: Optional[str] = None,
                 shuffle_seed: Optional[int] = 1234):
        self.items: List[Tuple[str, int]] = load_filelist(filelist_path)
        self.cfg = cfg
        self.cache_dir = cache_dir or cfg.cache_dir
        os.makedirs(self.cache_dir, exist_ok=True)
        if shuffle_seed is not None:
            random.Random(shuffle_seed).shuffle(self.items)  # vc_ms.py:40-41

    def __len__(self) -> int:
        return len(self.items)

    def _cached(self, key: str, compute) -> np.ndarray:
        path = os.path.join(self.cache_dir, hash_string(key) + ".npy")
        if os.path.exists(path):
            return np.load(path)
        value = compute()
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "wb") as f:  # file handle: np.save won't append .npy
            np.save(f, value)
        os.replace(tmp, path)
        return value

    def get_item(self, index: int, pitch_shift: int = 0) -> Dict[str, np.ndarray]:
        """pitch_shift (semitones) enables the Preload path's augmentation
        (preload_vc_ms.py:94-99: random ±12 st with p=0.7). Reference
        semantics: the shift applies to the SOURCE side only (x_wav and its
        pitch track) — the target y_wav stays unshifted, so the model learns
        to reconstruct the original audio from shifted content features
        (get_audio_preload passes pitch_shift only for the source-rate call,
        preload_vc_ms.py:52-70). Shifted variants cache separately."""
        path, sid = self.items[index]
        cfg = self.cfg
        src_sr, tgt_sr = cfg.source_sampling_rate, cfg.target_sampling_rate

        audio_holder: Dict[str, np.ndarray] = {}

        def load() -> np.ndarray:
            if "wav" not in audio_holder:
                wav, sr = read_wav(path)
                audio_holder["wav"] = wav
                audio_holder["sr"] = np.int64(sr)
            return audio_holder["wav"]

        shift_tag = f"_ps{pitch_shift}" if pitch_shift else ""

        def shifted(wav: np.ndarray, sr: int) -> np.ndarray:
            if pitch_shift:
                from vcvits_tpu.dsp.pitch_shift import pitch_shift as _ps

                return _ps(wav, sr, pitch_shift)
            return wav

        x_wav = self._cached(
            f"{path}_{src_sr}{shift_tag}",
            lambda: shifted(resample(load(), int(audio_holder["sr"]), src_sr), src_sr),
        )
        y_wav = self._cached(
            f"{path}_{tgt_sr}",
            lambda: resample(load(), int(audio_holder["sr"]), tgt_sr),
        )
        pitch_key = (
            f"{path}_{cfg.filter_length}_{cfg.win_length}_{cfg.num_pitch}_{src_sr}{shift_tag}"
        )
        x_pitch = self._cached(
            pitch_key,
            lambda: coarse_f0(
                estimate_pitch(
                    x_wav, sr=src_sr, n_fft=cfg.filter_length,
                    win_length=cfg.win_length, hop_length=320,
                ),
                f0_bin=cfg.num_pitch,
            ),
        )
        return {"sid": np.int64(sid), "x_wav": x_wav, "x_pitch": x_pitch, "y_wav": y_wav}

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.get_item(index)


def preprocess(dataset: "VoiceConversionDataset", num_workers: int = 4,
               log_every: int = 200) -> None:
    """Warm the cache for every item (reference train.py:74-79 fan-out,
    without the broken 2-arg call)."""
    from concurrent.futures import ThreadPoolExecutor

    def one(i):
        dataset.get_item(i)
        if log_every and i % log_every == 0:
            print(f"preprocess {i}/{len(dataset)}", flush=True)

    if num_workers <= 1:
        for i in range(len(dataset)):
            one(i)
    else:
        with ThreadPoolExecutor(num_workers) as ex:
            list(ex.map(one, range(len(dataset))))
