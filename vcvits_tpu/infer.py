"""Inference API: file-to-file any-to-any voice conversion.

Capability parity with /root/reference/infer.py:36-91 (get_audio + convert):
load the latest checkpoint, resample the source to 16 kHz, optional
semitone pitch shift, pYIN -> coarse F0, run SynthesizerSVC.infer, write
48 kHz PCM_24. (The reference's module-path import defect at infer.py:17 —
vits.model.vcvits — obviously has no analog here.)

TPU notes: inputs are padded up to an alignment-unit boundary so repeated
conversions reuse a small set of compiled programs; one jitted program per
padded length.
"""

from __future__ import annotations

import logging
import os
from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.config import Config, load_config
from vcvits_tpu.data.collate import alignment_unit
from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
from vcvits_tpu.dsp.pitch_shift import pitch_shift as shift_semitones
from vcvits_tpu.dsp.resample import resample
from vcvits_tpu.models.synthesizer import SynthesizerSVC
from vcvits_tpu.utils.audio_io import read_wav, write_wav

logger = logging.getLogger(__name__)


class VoiceConverter:
    def __init__(self, cfg: Config, g_params, dtype=jnp.float32, hubert_cfg=None,
                 quant_int8: bool = False):
        self.cfg = cfg
        self.g_params = g_params
        gen = SynthesizerSVC.from_config(cfg, dtype=dtype)
        if hubert_cfg is not None:
            gen = gen.clone(hubert_cfg=hubert_cfg)
        if quant_int8:
            # int8 decoder convs — same checkpoint, weights quantize at
            # call time (hifigan.py quant_int8). True = dynamic W8A8;
            # "w8" = weight-only (bf16 activations).
            gen = gen.clone(dec_quant_int8=quant_int8)
        self.gen = gen
        self.unit = alignment_unit(cfg.data)
        self._infer = jax.jit(
            lambda p, w, l, pi, s, k, noise_scale: gen.apply(
                {"params": p}, w, l, pi, s, noise_scale=noise_scale,
                rng=k, method=SynthesizerSVC.infer,
            ),
            static_argnames=("noise_scale",),
        )
        from vcvits_tpu.dsp.spectrogram import stft_magnitude as _stft

        d = cfg.data

        def _vc_fn(p, wav48, lens, s_src, s_tgt, k):
            spec = _stft(wav48, d.filter_length, d.hop_length, d.win_length)
            return gen.apply({"params": p}, spec, lens, s_src, s_tgt, rng=k,
                             method=SynthesizerSVC.voice_conversion)

        self._vc = jax.jit(_vc_fn)  # STFT fused into the same program

    # ------------------------------------------------------------------ load
    @classmethod
    def from_checkpoint(
        cls, workdir: str, cfg: Optional[Config] = None,
        step: Optional[int] = None, dtype=jnp.float32, hubert_cfg=None,
        quant_int8: bool = False,
    ) -> "VoiceConverter":
        from vcvits_tpu.train.checkpoint import CheckpointManager

        ckpt_dir = os.path.abspath(os.path.join(workdir, "checkpoints"))
        mgr = CheckpointManager(ckpt_dir)
        step = step if step is not None else mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        # sharding-agnostic numpy restore: a CPU-trained checkpoint must
        # load in a TPU inference process (and vice versa)
        raw = mgr.restore_raw(step)
        logger.info("loaded checkpoint step %d from %s", step, ckpt_dir)
        if cfg is None:
            cfg_path = os.path.join(workdir, "config.json")
            cfg = load_config(cfg_path) if os.path.exists(cfg_path) else Config()
        return cls(cfg, raw["g_params"], dtype=dtype, hubert_cfg=hubert_cfg,
                   quant_int8=quant_int8)

    # --------------------------------------------------------------- convert
    def prepare_source(
        self, path: str, pitch_shift: int = 0
    ) -> Tuple[np.ndarray, int, np.ndarray]:
        """wav file -> (padded 16k source, true length, coarse pitch)."""
        d = self.cfg.data
        wav, sr = read_wav(path)
        wav = resample(wav, sr, d.source_sampling_rate)
        if pitch_shift != 0:
            wav = shift_semitones(wav, d.source_sampling_rate, pitch_shift)
        true_len = len(wav)
        padded = int(np.ceil(max(true_len, 1) / self.unit) * self.unit)
        wav = np.pad(wav, (0, padded - true_len))
        f0 = estimate_pitch(
            wav, sr=d.source_sampling_rate, n_fft=d.filter_length,
            win_length=d.win_length, hop_length=320,
        )
        pitch = coarse_f0(f0, f0_bin=d.num_pitch)
        return wav.astype(np.float32), true_len, pitch

    def convert_array(
        self,
        wav16k: np.ndarray,
        pitch: np.ndarray,
        speaker_id: int,
        true_len: Optional[int] = None,
        noise_scale: float = 1.0,
        rng_seed: int = 0,
    ) -> np.ndarray:
        d = self.cfg.data
        true_len = true_len if true_len is not None else len(wav16k)
        o, y_mask, _ = self._infer(
            self.g_params,
            jnp.asarray(wav16k)[None, :],
            jnp.asarray([true_len], dtype=jnp.int32),
            jnp.asarray(pitch)[None, :],
            jnp.asarray([speaker_id], dtype=jnp.int32),
            jax.random.PRNGKey(rng_seed),
            noise_scale,
        )
        n_valid = int(np.asarray(y_mask)[0].sum()) * d.hop_length
        return np.asarray(o)[0, :n_valid, 0]

    def convert(
        self,
        source_audio: str,
        target_audio: str,
        speaker_id: int,
        pitch_shift: int = 0,
        noise_scale: float = 1.0,
    ) -> np.ndarray:
        """File -> file, PCM_24 at the target rate (infer.py:64-91)."""
        wav, true_len, pitch = self.prepare_source(source_audio, pitch_shift)
        out = self.convert_array(wav, pitch, speaker_id, true_len, noise_scale)
        write_wav(target_audio, out, self.cfg.data.target_sampling_rate, subtype="PCM_24")
        return out

    def convert_many(
        self,
        jobs,
        pitch_shift: int = 0,
        noise_scale: float = 1.0,
        collect_audio: bool = False,
    ):
        """Pipelined batch conversion: jobs is a sequence of
        (source_path, output_path, speaker_id) triples.

        Double-buffers host work against device work (ROADMAP item 6,
        tunnel-aware serving): while the device converts file i, a worker
        thread runs file i+1's host-side prepare (read/resample/pYIN —
        the dominant host cost). Throughput approaches
        max(host_prepare, device_convert) per file instead of their sum.

        Returns the output paths. Results are already on disk; pass
        ``collect_audio=True`` to additionally get the waveforms back
        (O(total audio) memory — avoid on large batches).
        """
        from concurrent.futures import ThreadPoolExecutor

        jobs = list(jobs)
        outs = []
        with ThreadPoolExecutor(max_workers=1) as pool:
            fut = pool.submit(self.prepare_source, jobs[0][0], pitch_shift) \
                if jobs else None
            for i, (src, dst, sid) in enumerate(jobs):
                wav, true_len, pitch = fut.result()
                if i + 1 < len(jobs):
                    fut = pool.submit(self.prepare_source, jobs[i + 1][0],
                                      pitch_shift)
                out = self.convert_array(wav, pitch, sid, true_len, noise_scale)
                write_wav(dst, out, self.cfg.data.target_sampling_rate,
                          subtype="PCM_24")
                outs.append(out if collect_audio else dst)
        return outs

    # --------------------------------------------------- flow-swap conversion
    def voice_conversion(
        self,
        source_audio: str,
        target_audio: str,
        sid_src: int,
        sid_tgt: int,
        rng_seed: int = 0,
    ) -> np.ndarray:
        """Any-to-any via the posterior+flow swap (synthesizer_svc.py:111-119):
        enc_q(y, g_src) -> flow fwd (g_src) -> flow rev (g_tgt) -> decoder.
        The source must be audio OF speaker sid_src; content survives the
        latent swap while speaker identity is replaced."""
        d = self.cfg.data
        wav, sr = read_wav(source_audio)
        wav = resample(wav, sr, d.target_sampling_rate)
        unit_y = self.unit * d.target_sampling_rate // d.source_sampling_rate
        true_len = len(wav)
        padded = int(np.ceil(max(true_len, 1) / unit_y) * unit_y)
        wav = np.pad(wav, (0, padded - true_len))
        spec_lens = jnp.asarray([true_len // d.hop_length], jnp.int32)
        o, y_mask, _ = self._vc(
            self.g_params, jnp.asarray(wav)[None, :], spec_lens,
            jnp.asarray([sid_src], jnp.int32), jnp.asarray([sid_tgt], jnp.int32),
            jax.random.PRNGKey(rng_seed),
        )
        n_valid = int(np.asarray(y_mask)[0].sum()) * d.hop_length
        out = np.asarray(o)[0, :n_valid, 0]
        write_wav(target_audio, out, d.target_sampling_rate, subtype="PCM_24")
        return out
