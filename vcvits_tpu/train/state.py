"""Train state: generator + discriminator params, optimizers, schedules.

Capability parity with /root/reference/vits/light/vcvits.py:247-263
(configure_optimizers): AdamW(lr 2e-4, betas (0.8, 0.99), eps 1e-9) for G
and for the chained period+scale discriminators, with per-epoch
ExponentialLR(gamma=lr_decay). TPU redesign: one flax struct holds both
sides so the whole GAN step is a single pure function; the frozen HuBERT
subtree is masked out of the G optimizer (the reference freezes via
requires_grad=False, content_encoder.py:33-35), so no Adam state is
allocated for ~95M frozen params.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from vcvits_tpu.config import Config


@flax.struct.dataclass
class GANTrainState:
    step: jax.Array
    g_params: Any
    g_opt_state: Any
    d_params: Any  # {"mpd": ..., "msd": ...}
    d_opt_state: Any


def resolve_steps_per_epoch(cfg: Config, steps_per_epoch: Optional[int] = None) -> int:
    """cfg.train.steps_per_epoch overrides; else the value derived from the
    loader (len(dataset)//batch_size); else a documented 1000-step fallback."""
    if cfg.train.steps_per_epoch is not None:
        return max(int(cfg.train.steps_per_epoch), 1)
    if steps_per_epoch is not None:
        return max(int(steps_per_epoch), 1)
    return 1000


def exponential_epoch_schedule(
    cfg: Config, steps_per_epoch: Optional[int] = None
) -> Callable[[jax.Array], jax.Array]:
    """lr = lr0 * lr_decay^epoch, stepped per true dataset epoch like torch
    ExponentialLR in the reference (vcvits.py:247-263)."""
    lr0 = cfg.train.learning_rate
    gamma = cfg.train.lr_decay
    spe = resolve_steps_per_epoch(cfg, steps_per_epoch)

    def schedule(step):
        epoch = jnp.asarray(step, jnp.float32) // spe
        return lr0 * jnp.power(gamma, epoch)

    return schedule


def _is_frozen_path(path) -> bool:
    return any(getattr(p, "key", None) == "hubert" for p in path)


def make_optimizer(
    cfg: Config, freeze_hubert: bool, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    schedule = exponential_epoch_schedule(cfg, steps_per_epoch)
    opt = optax.adamw(
        learning_rate=schedule,
        b1=cfg.train.betas[0],
        b2=cfg.train.betas[1],
        eps=cfg.train.eps,
        weight_decay=0.01,  # torch AdamW default, as the reference uses
    )
    if cfg.train.grad_clip is not None:
        opt = optax.chain(optax.clip(cfg.train.grad_clip), opt)
    if cfg.trainer.accumulate_grad_batches > 1:
        opt = optax.MultiSteps(opt, cfg.trainer.accumulate_grad_batches)
    if freeze_hubert:
        def mask_fn(params):
            return jax.tree_util.tree_map_with_path(
                lambda path, _: not _is_frozen_path(path), params
            )
        opt = optax.masked(opt, mask_fn)
    return opt


def create_train_state(cfg: Config, g_params, d_params,
                       freeze_hubert: bool = True,
                       steps_per_epoch: Optional[int] = None) -> GANTrainState:
    """freeze_hubert=True for the VC path (frozen content encoder);
    False for the TTS path (no HuBERT in the graph)."""
    g_opt = make_optimizer(cfg, freeze_hubert=freeze_hubert,
                           steps_per_epoch=steps_per_epoch)
    d_opt = make_optimizer(cfg, freeze_hubert=False,
                           steps_per_epoch=steps_per_epoch)
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        g_opt_state=g_opt.init(g_params),
        d_params=d_params,
        d_opt_state=d_opt.init(d_params),
    )
