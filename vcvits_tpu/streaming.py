"""Streaming chunked 48 kHz voice conversion.

The capability the reference LACKS: its inference truncates at
max_len=2000 frames ≈ 21.3 s (/root/reference/infer.py:86, SURVEY.md §5.7)
and long inputs are silently cut. BASELINE.json config 5 asks for streaming
chunked conversion for real-time serving.

Design (windowed-overlap streaming):
* Source audio arrives in arbitrary-size pieces; an internal buffer cuts
  it into fixed chunks (static XLA shapes -> ONE compiled program reused
  for every chunk).
* Each chunk is converted inside a window [left_ctx | chunk | right_ctx]
  so HuBERT's receptive field, the relative-attention window (±4 frames),
  and the decoder's conv halo all see real context; only the center is
  emitted.
* Consecutive emissions are equal-power cross-faded over `crossfade_ms`
  to hide any residual boundary phase mismatch from the prior-noise
  resampling.
* Pitch (pYIN) runs host-side per window on the fly.

Latency = chunk + right context (default 2.16 s); throughput is the
chunk RTF of the jitted infer program.
"""

from __future__ import annotations

from typing import Iterator, List, Optional

import numpy as np

from vcvits_tpu.data.collate import alignment_unit
from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
from vcvits_tpu.infer import VoiceConverter


class StreamingConverter:
    def __init__(
        self,
        converter: VoiceConverter,
        speaker_id: int,
        chunk_seconds: float = 2.0,
        context_seconds: float = 0.16,
        crossfade_ms: float = 20.0,
        noise_scale: float = 1.0,
        rng_seed: int = 0,
    ):
        self.vc = converter
        self.sid = speaker_id
        self.noise_scale = noise_scale
        self.rng_seed = rng_seed
        cfg = converter.cfg.data
        self.src_sr = cfg.source_sampling_rate
        self.tgt_sr = cfg.target_sampling_rate
        self.ratio = self.tgt_sr // self.src_sr

        unit = alignment_unit(cfg)
        self.chunk = max(unit, int(round(chunk_seconds * self.src_sr / unit)) * unit)
        self.ctx = max(unit, int(round(context_seconds * self.src_sr / unit)) * unit)
        self.xfade = int(crossfade_ms / 1000.0 * self.tgt_sr)

        self._buf = np.zeros(0, np.float32)
        self._left = np.zeros(self.ctx, np.float32)  # left context (zeros at start)
        self._tail: Optional[np.ndarray] = None  # pending crossfade tail @48k
        self._chunk_index = 0

    # ----------------------------------------------------------------- core
    def _convert_window(self, window: np.ndarray, emit_src_len: int) -> np.ndarray:
        """Convert [ctx | emit | ctx] (16 k); return the emit region @48k
        extended `xfade` samples into the left-context rendering (that span
        of time was also rendered at the END of the previous window — the
        two renderings are cross-faded in _emit)."""
        f0 = estimate_pitch(
            window, sr=self.src_sr, n_fft=self.vc.cfg.data.filter_length,
            win_length=self.vc.cfg.data.win_length, hop_length=320,
        )
        pitch = coarse_f0(f0, f0_bin=self.vc.cfg.data.num_pitch)
        out = self.vc.convert_array(
            window, pitch, self.sid, true_len=len(window),
            noise_scale=self.noise_scale, rng_seed=self.rng_seed,
        )
        start = self.ctx * self.ratio
        lead = min(self.xfade, start)
        return out[start - lead : start + emit_src_len * self.ratio]

    def _emit(self, piece: np.ndarray) -> Optional[np.ndarray]:
        """Overlap-crossfade `piece` (which leads with `xfade` samples of
        already-emitted time) against the held tail, hold back a new tail."""
        lead = min(self.xfade, max(len(piece) - 1, 0))
        if self._tail is not None and lead > 0:
            ramp = np.sin(0.5 * np.pi * np.linspace(0, 1, lead)) ** 2
            piece = piece.copy()
            piece[:lead] = ramp * piece[:lead] + (1 - ramp) * self._tail[-lead:]
        elif lead > 0:
            piece = piece[lead:]  # first chunk: no previous rendering
        if self.xfade > 0 and len(piece) > self.xfade:
            out, self._tail = piece[: -self.xfade], piece[-self.xfade :]
        else:
            out, self._tail = piece[:0], piece if len(piece) else None
        return out if len(out) else None

    # ------------------------------------------------------------------ api
    def push(self, samples: np.ndarray) -> Iterator[np.ndarray]:
        """Feed 16 kHz source samples; yields converted 48 kHz pieces."""
        self._buf = np.concatenate([self._buf, np.asarray(samples, np.float32)])
        while len(self._buf) >= self.chunk + self.ctx:
            chunk = self._buf[: self.chunk]
            right = self._buf[self.chunk : self.chunk + self.ctx]
            window = np.concatenate([self._left, chunk, right])
            # window emit region includes the crossfade overlap on the left
            piece = self._convert_window(window, self.chunk)
            self._left = np.concatenate([self._left, chunk])[-self.ctx :]
            self._buf = self._buf[self.chunk :]
            self._chunk_index += 1
            out = self._emit(piece)
            if out is not None:
                yield out

    def flush(self) -> Iterator[np.ndarray]:
        """Convert whatever remains (right-padded with silence) and finish."""
        while len(self._buf) > 0:
            remain = min(len(self._buf), self.chunk)
            padded = np.zeros(self.chunk + self.ctx, np.float32)
            take = self._buf[: self.chunk + self.ctx]
            padded[: len(take)] = take
            window = np.concatenate([self._left, padded])
            piece = self._convert_window(window, self.chunk)
            lead = len(piece) - self.chunk * self.ratio  # crossfade overlap
            piece = piece[: lead + remain * self.ratio]
            self._left = np.concatenate([self._left, padded[: self.chunk]])[-self.ctx :]
            self._buf = self._buf[remain:]
            out = self._emit(piece)
            if out is not None:
                yield out
        if self._tail is not None:
            tail, self._tail = self._tail, None
            yield tail

    def convert_stream(
        self, pieces: Iterator[np.ndarray]
    ) -> Iterator[np.ndarray]:
        for p in pieces:
            yield from self.push(p)
        yield from self.flush()

    def reset(self) -> None:
        self._buf = np.zeros(0, np.float32)
        self._left = np.zeros(self.ctx, np.float32)
        self._tail = None
        self._chunk_index = 0
