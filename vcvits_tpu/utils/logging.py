"""TensorBoard logging (scalars / mel images / audio).

Capability parity with /root/reference/vits/utils.py:61-131 (summarize,
plot_spectrogram_to_numpy) on top of torch.utils.tensorboard. Host-side
only; degrades to a no-op when tensorboard is unavailable.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def mel_to_image(mel: np.ndarray) -> np.ndarray:
    """[T, n_mels] log-mel -> [3, n_mels, T] uint8 viridis image."""
    mel = np.asarray(mel, dtype=np.float32).T  # [n_mels, T], low bin at top
    lo, hi = float(mel.min()), float(mel.max())
    norm = (mel - lo) / max(hi - lo, 1e-6)
    try:
        import matplotlib.cm as cm

        rgba = cm.viridis(norm[::-1])  # flip so low freqs at bottom
        img = (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:
        img = (np.stack([norm[::-1]] * 3, -1) * 255).astype(np.uint8)
    return img.transpose(2, 0, 1)


def alignment_to_image(attn: np.ndarray) -> np.ndarray:
    """[T_text, T_spec] attention/alignment -> [3, T_text, T_spec] uint8
    image (reference utils.plot_alignment_to_numpy, utils.py:100-115)."""
    a = np.asarray(attn, dtype=np.float32)
    lo, hi = float(a.min()), float(a.max())
    norm = (a - lo) / max(hi - lo, 1e-6)
    try:
        import matplotlib.cm as cm

        rgba = cm.viridis(norm)
        img = (rgba[..., :3] * 255).astype(np.uint8)
    except Exception:
        img = (np.stack([norm] * 3, -1) * 255).astype(np.uint8)
    return img.transpose(2, 0, 1)


class TensorBoardLogger:
    def __init__(self, logdir: str):
        self.logdir = logdir
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._writer = SummaryWriter(logdir)
        except Exception as e:  # tensorboard optional
            logger.warning("TensorBoard unavailable (%s); logging to stdout only", e)
            self._writer = None

    def summarize(
        self,
        global_step: int,
        scalars: Optional[Dict[str, float]] = None,
        histograms: Optional[Dict[str, np.ndarray]] = None,
        images: Optional[Dict[str, np.ndarray]] = None,
        audios: Optional[Dict[str, np.ndarray]] = None,
        audio_sampling_rate: int = 48000,
    ) -> None:
        """Scalars / histograms / images / audio in one call — the reference
        utils.summarize signature (utils.py:61-69)."""
        if self._writer is None:
            if scalars:
                parts = " ".join(f"{k}={float(v):.4g}" for k, v in scalars.items())
                logger.info("step %d %s", global_step, parts)
            return
        for k, v in (scalars or {}).items():
            self._writer.add_scalar(k, float(v), global_step)
        for k, v in (histograms or {}).items():
            self._writer.add_histogram(k, np.asarray(v), global_step)
        for k, v in (images or {}).items():
            self._writer.add_image(k, v, global_step)
        for k, v in (audios or {}).items():
            import torch

            wav = torch.from_numpy(np.asarray(v, dtype=np.float32).reshape(1, -1))
            self._writer.add_audio(k, wav, global_step, sample_rate=audio_sampling_rate)

    def flush(self):
        if self._writer is not None:
            self._writer.flush()

    def close(self):
        if self._writer is not None:
            self._writer.close()
