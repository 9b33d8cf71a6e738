"""TTS inference API: text -> 48 kHz waveform from a TTSTrainer checkpoint.

The reference ships no TTS inference entry point at all — its TTS path
cannot even construct (broken imports, /root/reference/vits/model/
synthesizers/synthesizer_tts.py:22,118). This framework's TTS path trains
(train/tts_trainer.py); this module completes it with the user-facing
synthesis surface, mirroring VoiceConverter's design (infer.py):

- raw Orbax restore of ``g_params`` (no optimizer template needed),
- text padded to a small set of static bucket lengths so repeated
  synthesis reuses a bounded set of compiled programs (one per
  (text bucket, frame budget) pair — XLA static shapes),
- output trimmed to the predicted-duration valid frames (y_mask).
"""

from __future__ import annotations

import logging
import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.config import Config, load_config
from vcvits_tpu.models.synthesizer_tts import SynthesizerTTS
from vcvits_tpu.utils.audio_io import write_wav

logger = logging.getLogger(__name__)


class TTSSynthesizer:
    """Text-to-speech synthesis with a trained SynthesizerTTS.

    ``text_unit`` is the token-bucket granularity: input sequences are
    zero-padded up to the next multiple, and the decoder frame budget is
    ``frames_per_token * padded_len`` (the reference's 20-frames-per-token
    ceiling, synthesizer_tts.py:152) unless ``max_frames`` overrides it.
    """

    def __init__(self, cfg: Config, g_params, dtype=jnp.float32,
                 cleaners: Sequence[str] = ("english_cleaners",),
                 add_blank: bool = False, text_unit: int = 32,
                 frames_per_token: int = 20):
        from vcvits_tpu.train.tts_step import build_tts_models

        self.cfg = cfg
        self.g_params = g_params
        self.cleaners = tuple(cleaners)
        self.add_blank = add_blank
        self.text_unit = int(text_unit)
        self.frames_per_token = int(frames_per_token)
        self.gen, _, _ = build_tts_models(cfg, dtype=dtype)
        self._infer = jax.jit(
            lambda p, x, xl, s, k, noise_scale, length_scale, noise_scale_w,
            max_frames: self.gen.apply(
                {"params": p}, x, xl, s,
                noise_scale=noise_scale, length_scale=length_scale,
                noise_scale_w=noise_scale_w, max_frames=max_frames,
                rng=k, method=SynthesizerTTS.infer,
            ),
            static_argnames=("noise_scale", "length_scale", "noise_scale_w",
                             "max_frames"),
        )

    # ------------------------------------------------------------------ load
    @classmethod
    def from_checkpoint(
        cls, workdir: str, cfg: Optional[Config] = None,
        step: Optional[int] = None, dtype=jnp.float32,
        cleaners: Sequence[str] = ("english_cleaners",),
        add_blank: bool = False, **kwargs,
    ) -> "TTSSynthesizer":
        from vcvits_tpu.train.checkpoint import CheckpointManager

        ckpt_dir = os.path.abspath(os.path.join(workdir, "checkpoints"))
        mgr = CheckpointManager(ckpt_dir)
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        # sharding-agnostic numpy restore: a CPU-trained checkpoint must
        # load in a TPU inference process (and vice versa)
        raw = mgr.restore_raw(step)
        logger.info("loaded TTS checkpoint step %d from %s", step, ckpt_dir)
        if cfg is None:
            cfg_path = os.path.join(workdir, "config.json")
            if os.path.exists(cfg_path):
                cfg = load_config(cfg_path)
            else:
                # a default Config() here would fail later with opaque flax
                # param-shape errors; fail clearly at the source instead
                raise FileNotFoundError(
                    f"no config.json under {workdir} and no cfg= given; "
                    "pass the training config explicitly (-c) or restore a "
                    "workdir that persisted one")
        return cls(cfg, raw["g_params"], dtype=dtype, cleaners=cleaners,
                   add_blank=add_blank, **kwargs)

    # ----------------------------------------------------------------- text
    def encode_text(self, text: str) -> np.ndarray:
        from vcvits_tpu.text import intersperse, text_to_sequence

        seq = text_to_sequence(text, self.cleaners)
        if self.add_blank:
            seq = intersperse(seq, 0)
        if not seq:
            raise ValueError(f"text {text!r} cleaned to an empty sequence")
        return np.asarray(seq, np.int64)

    # ----------------------------------------------------------- synthesize
    def synthesize(
        self,
        text: str,
        sid: int = 0,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        seed: int = 0,
        max_frames: Optional[int] = None,
        return_alignment: bool = False,
    ) -> np.ndarray | Tuple[np.ndarray, np.ndarray]:
        """Synthesize one utterance; returns float32 wav at the target rate."""
        seq = self.encode_text(text)
        n = len(seq)
        padded = int(np.ceil(n / self.text_unit) * self.text_unit)
        x = np.zeros((1, padded), np.int64)
        x[0, :n] = seq
        # static decoder frame budget for this text bucket; length_scale can
        # only stretch durations up to it, so scale the ceiling too
        budget = max_frames if max_frames is not None else int(
            np.ceil(self.frames_per_token * padded * max(1.0, length_scale)))
        o, attn, y_mask, _ = self._infer(
            self.g_params, jnp.asarray(x),
            jnp.asarray([n], dtype=jnp.int32),
            jnp.asarray([sid], dtype=jnp.int32),
            jax.random.PRNGKey(seed),
            float(noise_scale), float(length_scale), float(noise_scale_w),
            int(budget),
        )
        n_valid = int(np.asarray(y_mask)[0].sum()) * self.cfg.data.hop_length
        wav = np.asarray(o, np.float32)[0, :n_valid, 0]
        if return_alignment:
            return wav, np.asarray(attn)[0]
        return wav

    def synthesize_to_file(self, text: str, path: str, subtype: str = "PCM_24",
                           **kwargs) -> str:
        wav = self.synthesize(text, **kwargs)
        write_wav(path, wav, self.cfg.data.target_sampling_rate,
                  subtype=subtype)
        logger.info("wrote %s (%.2f s)", path,
                    len(wav) / self.cfg.data.target_sampling_rate)
        return path
