"""TTS training orchestrator (slim loop around the jitted TTS GAN step).

The reference's VITS TTS trainer cannot run as shipped (SURVEY.md §2.5);
this one does: bucketed (text, audio, F0) batches, one jitted step,
checkpoints, TB scalars, and TTS validation (synthesize a fixed sentence).
"""

from __future__ import annotations

import logging
import os
import random
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.config import Config
from vcvits_tpu.data.loader import prefetch
from vcvits_tpu.data.tts_dataset import TTSDataset, collate_tts
from vcvits_tpu.models.synthesizer_tts import SynthesizerTTS
from vcvits_tpu.parallel.mesh import make_mesh, shard_batch, shard_replicated
from vcvits_tpu.train.checkpoint import CheckpointManager
from vcvits_tpu.train.state import create_train_state
from vcvits_tpu.train.tts_step import build_tts_models, init_tts_params, make_tts_train_step
from vcvits_tpu.utils.logging import TensorBoardLogger
from vcvits_tpu.utils.profiling import StepTimer

logger = logging.getLogger(__name__)


class TTSTrainer:
    def __init__(self, cfg: Config, workdir: str = "logs_tts", dtype=jnp.float32,
                 text_bucket: int = 192, audio_seconds: float = 8.0,
                 cleaners: Sequence[str] = ("english_cleaners",),
                 add_blank: bool = False):
        self.cfg = cfg
        self.workdir = workdir
        self.dtype = dtype
        self.text_bucket = text_bucket
        self.audio_bucket = int(audio_seconds * cfg.data.target_sampling_rate)
        self.cleaners = cleaners
        self.add_blank = add_blank
        import math as _m

        n_dev = len(jax.devices())
        data_axis = _m.gcd(cfg.train.batch_size, n_dev)
        self.mesh = make_mesh(data=data_axis, model=1, devices=jax.devices()[:data_axis])
        self.tb = TensorBoardLogger(os.path.join(workdir, "tb"))
        self.ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
        os.makedirs(workdir, exist_ok=True)
        import json

        with open(os.path.join(workdir, "config.json"), "w") as f:
            json.dump(cfg.to_dict(), f, indent=1)
        self._step = jax.jit(make_tts_train_step(cfg, dtype=dtype), donate_argnums=(0,))

    def _batches(self, ds: TTSDataset, epoch: int):
        rng = random.Random(self.cfg.train.seed + epoch)
        order = list(range(len(ds)))
        rng.shuffle(order)
        bsz = self.cfg.train.batch_size
        for i in range(0, len(order) - bsz + 1, bsz):
            items = [ds.get_item(j) for j in order[i : i + bsz]]
            yield collate_tts(items, self.cfg.data, self.text_bucket,
                              self.audio_bucket, rng)

    def fit(self, train_files: str, max_steps: Optional[int] = None):
        cfg = self.cfg
        ds = TTSDataset(train_files, cfg.data, cleaners=self.cleaners,
                        add_blank=self.add_blank)
        state = None
        rng = jax.random.PRNGKey(cfg.train.seed)
        timer = StepTimer()

        for epoch in range(cfg.train.max_epochs):
            for batch in prefetch(self._batches(ds, epoch)):
                if state is None:
                    g_params, d_params = init_tts_params(
                        cfg, jax.random.PRNGKey(cfg.train.seed),
                        {k: jnp.asarray(v) for k, v in batch.items()},
                        dtype=self.dtype,
                    )
                    state = create_train_state(cfg, g_params, d_params,
                                               freeze_hubert=False)
                    state = shard_replicated(state, self.mesh)
                    step_no = self.ckpt.latest_step()
                    if step_no is not None:
                        state, _ = self.ckpt.restore_tolerant(state, step_no)
                        state = shard_replicated(state, self.mesh)
                        logger.info("resumed TTS training from step %d", step_no)
                step_no = int(state.step)
                if max_steps is not None and step_no >= max_steps:
                    return self._finish(state, step_no)
                rng, k = jax.random.split(rng)
                state, metrics = self._step(state, shard_batch(batch, self.mesh), k)
                timer.tick()
                step_no = int(state.step)
                if step_no % cfg.train.log_interval == 0:
                    metrics = jax.device_get(metrics)
                    self.tb.summarize(step_no, scalars={
                        **{k2: float(v) for k2, v in metrics.items() if np.ndim(v) == 0},
                        **({"steps_per_sec": timer.steps_per_sec}
                           if timer.steps_per_sec else {}),
                    })
                    logger.info("tts step %d loss_g=%.3f loss_d=%.3f dur=%.3f",
                                step_no, float(metrics["loss/g/total"]),
                                float(metrics["loss/d/total"]),
                                float(metrics["loss/g/dur"]))
                if (step_no % cfg.train.eval_interval == 0
                        and len(ds.items) > 0):
                    try:
                        self.log_validation(state, step_no, ds.items[0][2],
                                            sid=int(ds.items[0][1]))
                    except Exception:  # validation must never kill training
                        logger.exception("TTS validation logging failed")
                if step_no % cfg.train.checkpoint_interval == 0:
                    self.ckpt.save(step_no, state)
        if state is not None:
            return self._finish(state, int(state.step))
        return state

    def _finish(self, state, step_no: int):
        if self.ckpt.latest_step() != step_no:
            self.ckpt.save(step_no, state)
        self.ckpt.wait()
        self.tb.close()
        logger.info("TTS training finished at step %d", step_no)
        return state

    # ---------------------------------------------------------------- sample
    def synthesize(self, state_or_params, text: str, sid: int = 0,
                   max_frames: int = 1024, return_alignment: bool = False):
        """Text -> waveform with the current params (validation aid)."""
        from vcvits_tpu.text import text_to_sequence

        g_params = getattr(state_or_params, "g_params", state_or_params)
        gen, _, _ = build_tts_models(self.cfg, dtype=self.dtype)
        seq = text_to_sequence(text, self.cleaners)
        if self.add_blank:
            from vcvits_tpu.text import intersperse

            seq = intersperse(seq, 0)
        x = jnp.asarray(np.asarray(seq, np.int64))[None, :]
        o, attn, y_mask, _ = gen.apply(
            {"params": g_params}, x, jnp.array([len(seq)]), jnp.array([sid]),
            rng=jax.random.PRNGKey(0), max_frames=max_frames,
            method=SynthesizerTTS.infer,
        )
        n_valid = int(np.asarray(y_mask)[0].sum()) * self.cfg.data.hop_length
        wav = np.asarray(o)[0, :n_valid, 0]
        if return_alignment:
            return wav, np.asarray(attn)[0]
        return wav

    def log_validation(self, state, step_no: int, text: str, sid: int = 0):
        """Synthesize a fixed sentence; log audio + mel + the duration
        alignment image (reference utils.py:79-131 plot capability)."""
        from vcvits_tpu.dsp.spectrogram import mel_spectrogram
        from vcvits_tpu.utils.logging import alignment_to_image, mel_to_image

        d = self.cfg.data
        wav, attn = self.synthesize(state, text, sid=sid, return_alignment=True)
        images = {}
        if attn.ndim >= 2:
            a2 = attn if attn.ndim == 2 else attn.reshape(attn.shape[-2], attn.shape[-1])
            images["val/alignment"] = alignment_to_image(a2)
        t = (len(wav) // d.hop_length) * d.hop_length
        if t > 0:
            mel = np.asarray(mel_spectrogram(
                jnp.asarray(wav[:t])[None], d.filter_length, d.n_mel_channels,
                d.target_sampling_rate, d.hop_length, d.win_length,
                d.mel_fmin, d.mel_fmax))[0]
            images["val/mel"] = mel_to_image(mel)
        self.tb.summarize(step_no, images=images,
                          audios={"val/audio": wav},
                          audio_sampling_rate=d.target_sampling_rate)
        self.tb.flush()
