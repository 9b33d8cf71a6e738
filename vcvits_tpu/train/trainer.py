"""Training orchestrator: data -> jitted GAN step -> logging/ckpt/validation.

Capability parity with the reference's Lightning Trainer wiring
(/root/reference/train.py:82-113: loaders, VCVITS module, DDP strategy,
ModelCheckpoint(every 2000 steps), val every 1000 steps on 1 batch,
auto-resume from last.ckpt) — rebuilt as a plain loop around one jitted
train step, with device_put-sharded batches on a data-parallel mesh, async
Orbax checkpoints, and TensorBoard scalars/images/audio.
"""

from __future__ import annotations

import logging
import os
import signal
import threading
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vcvits_tpu.config import Config
from vcvits_tpu.data.dataset import VoiceConversionDataset, preprocess
from vcvits_tpu.data.loader import BucketedLoader, prefetch
from vcvits_tpu.dsp.spectrogram import mel_spectrogram
from vcvits_tpu.models.synthesizer import SynthesizerSVC
from vcvits_tpu.parallel.mesh import make_mesh, shard_batch, shard_replicated
from vcvits_tpu.train.checkpoint import CheckpointManager
from vcvits_tpu.train.state import create_train_state
from vcvits_tpu.train.step import build_models, init_params, make_train_step
from vcvits_tpu.utils.logging import TensorBoardLogger, mel_to_image
from vcvits_tpu.utils.memory import trim_host_memory

# steps between malloc_trim(0) calls in fit() — frequent enough to bound
# arena growth (~0.6 MB/step raw in the r3 convergence run), rare enough
# that the few-ms syscall cost is invisible
_TRIM_INTERVAL = 200

logger = logging.getLogger(__name__)


class Trainer:
    def __init__(
        self,
        cfg: Config,
        workdir: str = "logs",
        dtype=jnp.float32,
        hubert_cfg=None,
        hubert_params=None,
        preload: bool = False,
        preload_shift_aug: bool = False,
        model_parallel: int = 1,
    ):
        self.cfg = cfg
        self.workdir = workdir
        self.dtype = dtype
        self.hubert_cfg = hubert_cfg
        self.hubert_params = hubert_params
        # preload: train from precomputed HuBERT features (data/preload.py),
        # skipping the frozen ~95M-param forward each step;
        # preload_shift_aug: the reference's random ±12 st p=0.7 per-epoch
        # source augmentation (preload_vc_ms.py:94-99)
        self.preload = preload
        self.preload_shift_aug = preload_shift_aug
        # Mesh: data parallelism over as many devices as the global batch
        # admits (production: make batch_size a multiple of the device
        # count), times optional tensor parallelism over 'model' (the wide
        # HuBERT attention/FFN matmuls and >=512-channel convs are sharded
        # by parallel.mesh._tp_spec; XLA inserts the collectives).
        import math as _math

        self.model_parallel = max(int(model_parallel), 1)
        n_dev = len(jax.devices())
        if n_dev % self.model_parallel != 0:
            raise ValueError(
                f"model_parallel={self.model_parallel} does not divide "
                f"{n_dev} devices")
        avail = n_dev // self.model_parallel
        data_axis = _math.gcd(cfg.train.batch_size, avail)
        if data_axis * self.model_parallel < n_dev:
            logger.warning(
                "using %d-way data x %d-way model parallelism on %d of %d "
                "devices", data_axis, self.model_parallel,
                data_axis * self.model_parallel, n_dev,
            )
        self.mesh = make_mesh(
            data=data_axis, model=self.model_parallel,
            devices=jax.devices()[: data_axis * self.model_parallel])
        self.tb = TensorBoardLogger(os.path.join(workdir, "tb"))
        self.ckpt = CheckpointManager(os.path.join(workdir, "checkpoints"))
        # persist the config next to the checkpoints so inference can
        # reconstruct the exact graph (reference: Lightning
        # save_hyperparameters, vcvits.py:31)
        os.makedirs(workdir, exist_ok=True)
        import json as _json

        with open(os.path.join(workdir, "config.json"), "w") as f:
            _json.dump(cfg.to_dict(), f, indent=1)
        self.gen, self.mpd, self.msd = build_models(cfg, dtype=dtype, hubert_cfg=hubert_cfg)
        # steps_per_epoch (for the per-epoch ExponentialLR) is derived from
        # the actual loader at fit() time; the jitted step is built lazily.
        self._steps_per_epoch: Optional[int] = cfg.train.steps_per_epoch
        self._train_step = None
        # graceful-preemption flag: set by request_stop() or a SIGTERM/SIGINT
        # handler installed for the duration of fit(); checked at every step
        # boundary (the reference has no preemption story — SURVEY §5.3)
        self._stop_reason: Optional[str] = None
        self._infer = jax.jit(
            lambda p, w, l, pi, s, k: self.gen.apply(
                {"params": p}, w, l, pi, s, rng=k, method=SynthesizerSVC.infer
            )
        )

    # ------------------------------------------------------------------ setup
    def _ensure_train_step(self, steps_per_epoch: Optional[int]):
        """Build the jitted GAN step once steps_per_epoch is known
        (true-epoch ExponentialLR parity with vcvits.py:247-263)."""
        if self._train_step is None:
            self._steps_per_epoch = self._steps_per_epoch or steps_per_epoch
            self._train_step = jax.jit(
                make_train_step(self.cfg, dtype=self.dtype,
                                hubert_cfg=self.hubert_cfg,
                                steps_per_epoch=self._steps_per_epoch),
                donate_argnums=(0,),
            )
        return self._train_step

    def _maybe_device_cache(self, train_ds, train_loader):
        """Swap the streaming loader for a device-resident batcher when the
        corpus fits in HBM (cfg.train.device_data_cache, data/device_cache.py
        rationale: per-step h2d drops from audio to an index vector)."""
        mode = getattr(self.cfg.train, "device_data_cache", "off")
        if mode == "off":
            return train_loader, False
        if self.preload:
            if mode == "on":
                logger.warning(
                    "device_data_cache ignored: the preload path feeds "
                    "precomputed HuBERT features (and may re-draw per-epoch "
                    "pitch-shift variants) — streaming loader kept")
            return train_loader, False
        from vcvits_tpu.data.device_cache import (
            DeviceBatcher, estimate_corpus_bytes)
        if mode == "auto":
            est = estimate_corpus_bytes(train_ds, self.cfg.data)
            if est > self.cfg.train.device_cache_max_bytes:
                logger.info(
                    "device_data_cache=auto: corpus ~%.0f MB exceeds the "
                    "%.0f MB gate — streaming loader kept", est / 1e6,
                    self.cfg.train.device_cache_max_bytes / 1e6)
                return train_loader, False
        # seed 1234 mirrors the BucketedLoader default so both loaders
        # produce identical epoch shuffles (tests/test_device_cache.py)
        batcher = DeviceBatcher(
            train_ds, self.cfg.data, self.cfg.train.batch_size, mesh=self.mesh)
        logger.info("device_data_cache: %d items resident on device "
                    "(%d batches/epoch)", len(train_ds), len(batcher))
        return batcher, True

    def init_state(self, example_batch: Dict[str, np.ndarray]):
        batch = {k: jnp.asarray(v) for k, v in example_batch.items()}
        g_params, d_params = init_params(
            self.cfg, jax.random.PRNGKey(self.cfg.train.seed), batch,
            dtype=self.dtype, hubert_cfg=self.hubert_cfg,
        )
        if self.hubert_params is not None:
            g_params["enc_p"]["hubert"] = jax.tree.map(
                jnp.asarray, self.hubert_params
            )
        # Shard params BEFORE building the optimizer: optax init is
        # zeros_like over the param tree, so Adam mu/nu inherit each
        # param's placement (TP spec or full replication) for free.
        if self.model_parallel > 1:
            from vcvits_tpu.parallel.mesh import shard_params_tp

            g_params = shard_params_tp(g_params, self.mesh)
            d_params = shard_params_tp(d_params, self.mesh)
        else:
            g_params = shard_replicated(g_params, self.mesh)
            d_params = shard_replicated(d_params, self.mesh)
        state = create_train_state(self.cfg, g_params, d_params,
                                   steps_per_epoch=self._steps_per_epoch)
        # Adam mu/nu inherited the param placements via zeros_like; scalars
        # (step, optimizer counts) were created on the default device —
        # replicate those onto the mesh so the jitted step sees one device set.
        from jax.sharding import NamedSharding

        def place(x):
            if isinstance(getattr(x, "sharding", None), NamedSharding):
                return x
            return jax.device_put(x, NamedSharding(self.mesh, jax.sharding.PartitionSpec()))
        return jax.tree.map(place, state)

    def resume_or_init(self, example_batch):
        state = self.init_state(example_batch)
        step = self.ckpt.latest_step()
        if step is not None:
            # Re-apply the freshly-initialised state's shardings (TP or
            # replicated) to the restored host arrays, leaf by leaf.
            shardings = jax.tree.map(lambda x: getattr(x, "sharding", None),
                                     state)
            state, changed = self.ckpt.restore_tolerant(state, step)
            state = jax.tree.map(
                lambda x, s: jax.device_put(x, s) if s is not None else x,
                state, shardings)
            logger.info("resumed from step %d (tolerant=%s)", step, changed)
        return state

    # ---------------------------------------------------------- preemption
    def request_stop(self, reason: str = "request_stop") -> None:
        """Ask the running fit() to checkpoint and return at the next step
        boundary (thread-safe: just sets a flag the loop polls)."""
        self._stop_reason = reason

    def _install_preemption_handlers(self):
        """SIGTERM/SIGINT -> graceful checkpoint-and-exit. TPU maintenance
        events and batch schedulers deliver SIGTERM; the reference dies and
        loses up to checkpoint_interval steps of work (its only recovery is
        crash-and-resume from last.ckpt, /root/reference/train.py:112-113).
        Returns (signal, previous_handler) pairs for restoration; empty when
        not on the main thread (signal.signal would raise there)."""
        if threading.current_thread() is not threading.main_thread():
            return []
        installed = []
        def _handler(signum, frame):  # noqa: ARG001
            name = signal.Signals(signum).name
            self._stop_reason = name
            logger.warning(
                "received %s: checkpointing and exiting at the next step "
                "boundary (send again to kill immediately)", name)
            # a second signal falls through to the default handler
            # (getsignal/signal report None for handlers installed by
            # non-Python code — substitute SIG_DFL, None is not settable)
            old = prev.get(signum)
            signal.signal(signum, signal.SIG_DFL if old is None else old)
        prev = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                prev[sig] = signal.signal(sig, _handler)
                installed.append((sig, prev[sig]))
            except (ValueError, OSError):  # non-main thread / exotic host
                pass
        return installed

    # ------------------------------------------------------------------- fit
    def fit(
        self,
        train_files: Optional[str] = None,
        val_files: Optional[str] = None,
        max_steps: Optional[int] = None,
        train_loader=None,
        val_loader=None,
        max_seconds: Optional[float] = None,
    ):
        cfg = self.cfg
        ds_cls = VoiceConversionDataset
        ds_kwargs = {}
        if self.preload:
            from vcvits_tpu.data.preload import PreloadVoiceConversionDataset
            ds_cls = PreloadVoiceConversionDataset
            ds_kwargs = {"random_shift": self.preload_shift_aug,
                         "shift_seed": cfg.train.seed}
        device_cached = False
        if train_loader is None:
            train_ds = ds_cls(train_files or cfg.data.training_files, cfg.data,
                              **ds_kwargs)
            train_loader = BucketedLoader(train_ds, cfg.data, cfg.train.batch_size)
            train_loader, device_cached = self._maybe_device_cache(
                train_ds, train_loader)
        if val_loader is None and (val_files or cfg.data.validation_files):
            try:
                val_ds = VoiceConversionDataset(
                    val_files or cfg.data.validation_files, cfg.data
                )
                val_loader = BucketedLoader(
                    val_ds, cfg.data, min(cfg.train.batch_size, max(len(val_ds), 1)),
                    shuffle=False, drop_last=False,
                )
            except FileNotFoundError:
                val_loader = None

        train_step = self._ensure_train_step(max(len(train_loader), 1))

        state = None
        step_no = 0
        rng = jax.random.PRNGKey(cfg.train.seed)
        t_log = time.perf_counter()
        deadline = (time.monotonic() + max_seconds) \
            if max_seconds is not None else None  # 0 = stop at first boundary
        # NOTE: _stop_reason is NOT cleared here — request_stop() may
        # legitimately arrive before fit() (e.g. a wrapping scheduler);
        # the finally block consumes it so a later fit() starts fresh even
        # when this one exits via an exception.
        handlers = self._install_preemption_handlers()
        try:
            for epoch in range(cfg.train.max_epochs):
                epoch_iter = (train_loader.epoch_batches(epoch) if device_cached
                              else prefetch(train_loader.epoch_batches(epoch)))
                for batch in epoch_iter:
                    if state is None:
                        state = self.resume_or_init(batch)
                        # ONE device sync to learn the resume point; from here
                        # the step counter is tracked host-side so the loop
                        # never blocks on the device between log intervals
                        # (the per-step int(state.step) sync cost ~25-30 ms
                        # over the tunnel — measured 5.71 vs 7.98 steps/s at
                        # B=8, bench.py sync-amortized A/B).
                        step_no = int(state.step)
                    if max_steps is not None and step_no >= max_steps:
                        return self._finish(state, step_no)
                    if self._stop_reason is not None or (
                            deadline is not None
                            and time.monotonic() >= deadline):
                        reason = self._stop_reason or \
                            f"time limit {max_seconds:.0f}s"
                        logger.warning(
                            "graceful stop at step %d (%s): saving final "
                            "checkpoint", step_no, reason)
                        return self._finish(state, step_no)
                    rng, step_rng = jax.random.split(rng)
                    # device-cached batches are already resident + data-sharded
                    sharded = batch if device_cached else shard_batch(batch, self.mesh)
                    state, metrics = train_step(state, sharded, step_rng)
                    step_no += 1

                    if step_no % cfg.train.log_interval == 0:
                        metrics = jax.device_get(metrics)
                        dt = time.perf_counter() - t_log
                        t_log = time.perf_counter()
                        sps = cfg.train.log_interval / max(dt, 1e-9)
                        self.tb.summarize(
                            step_no,
                            scalars={**{k: float(v) for k, v in metrics.items()
                                        if np.ndim(v) == 0},
                                     "steps_per_sec": sps},
                        )
                        logger.info(
                            "step %d loss_g=%.3f loss_d=%.3f mel=%.3f (%.2f steps/s)",
                            step_no, float(metrics["loss/g/total"]),
                            float(metrics["loss/d/total"]), float(metrics["loss/g/mel"]),
                            sps,
                        )
                    if val_loader is not None and step_no % cfg.train.eval_interval == 0:
                        self.validate(state, val_loader, step_no)
                    if step_no % cfg.train.checkpoint_interval == 0:
                        self.ckpt.save(step_no, state)
                    if step_no % _TRIM_INTERVAL == 0:
                        # return glibc arena growth from per-step d2h traffic
                        # to the kernel (reports/host_leak_r4.json; ~ms cost)
                        trim_host_memory(collect=False)
            if state is not None:
                return self._finish(state, int(state.step))
            return state
        finally:
            # consumed (or abandoned, when fit() exits via an exception):
            # a later fit() in this process must start fresh, not inherit
            # a stale stop flag and "gracefully stop" at step 0
            self._stop_reason = None
            for sig, old in handlers:
                signal.signal(sig, signal.SIG_DFL if old is None else old)

    def _finish(self, state, step_no: int):
        if self.ckpt.latest_step() != step_no:
            self.ckpt.save(step_no, state)
        self.ckpt.wait()
        self.tb.flush()
        self.tb.close()
        logger.info("training finished at step %d", step_no)
        return state

    # ------------------------------------------------------------- validation
    def validate(self, state, val_loader, step_no: int):
        """Reference validation_step (vcvits.py:185-245): infer on one batch,
        log generated vs ground-truth mel images + audio — plus objective
        metrics (MCD / F0-RMSE / voicing F1, vcvits_tpu/eval.py) the
        reference never had. Returns the scalar metrics dict."""
        cfg = self.cfg
        d = cfg.data
        try:
            batch = next(iter(val_loader.epoch_batches(0)))
        except StopIteration:
            return
        rng = jax.random.PRNGKey(0)
        o, y_mask, _ = self._infer(
            state.g_params, jnp.asarray(batch["x_wav"]),
            jnp.asarray(batch["x_wav_lengths"]), jnp.asarray(batch["x_pitch"]),
            jnp.asarray(batch["sid"]), rng,
        )
        o = np.asarray(jax.device_get(o))[0, :, 0]
        n_valid = int(np.asarray(y_mask)[0].sum()) * d.hop_length
        y = batch["y_wav"][0][: int(batch["y_wav_lengths"][0])]

        def mel_of(wav):
            t = (len(wav) // d.hop_length) * d.hop_length
            if t == 0:
                return np.zeros((1, d.n_mel_channels), np.float32)
            m = mel_spectrogram(
                jnp.asarray(wav[:t])[None, :], d.filter_length, d.n_mel_channels,
                d.target_sampling_rate, d.hop_length, d.win_length,
                d.mel_fmin, d.mel_fmax,
            )
            return np.asarray(m)[0]

        # objective metrics vs ground truth (beyond the reference's
        # image/audio-only validation): same utterance, so sample-aligned
        # MCD (no DTW); F0 tracked at the 16 kHz front-end rate
        scalars = {}
        try:
            from vcvits_tpu.eval import evaluate_pair

            m = evaluate_pair(y, o[:n_valid], d.target_sampling_rate,
                              pitch_sr=d.source_sampling_rate, use_dtw=False)
            scalars["val/mcd_db"] = m["mcd_db"]
            scalars["val/voicing_f1"] = m["voicing_f1"]
            if np.isfinite(m["f0_rmse_cents"]):
                scalars["val/f0_rmse_cents"] = m["f0_rmse_cents"]
        except Exception:  # noqa: BLE001 — metrics must never kill training
            logger.exception("validation metrics failed")
        self.tb.summarize(
            step_no,
            scalars=scalars,
            images={
                "gen/mel": mel_to_image(mel_of(o[:n_valid])),
                "gt/mel": mel_to_image(mel_of(y)),
            },
            audios={"gen/audio": o[:n_valid], "gt/audio": y},
            audio_sampling_rate=d.target_sampling_rate,
        )
        self.tb.flush()
        return scalars
