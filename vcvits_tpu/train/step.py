"""The jitted GAN train step (generator update + discriminator update).

Capability parity with /root/reference/vits/light/vcvits.py:54-183
(training_step for optimizer_idx 0 and 1), redesigned as ONE pure XLA
program: spectrogram/mel feature extraction, generator forward, G loss +
update, then D loss + update on the stop-gradient waveform. Differences
from the reference, documented:

* D-step forward: by default (`cfg.train.d_recompute_forward=True`) we
  match the reference's Lightning two-optimizer loop exactly — the
  generator forward is RECOMPUTED for the D step with post-update G
  weights and fresh random slices. A measured 5k-step A/B
  (reports/ab_dstep_r2.json: mel-L1 17.7 vs 22.8) showed the recompute
  converges far better than the cheaper reuse-y_hat variant, which
  remains available as an opt-out (d_recompute_forward=False — half the
  generator FLOPs per step, at a real quality cost).
* grad norms are measured, not clipped (clip_grad_value_(None) parity,
  commons.py:145-160) unless cfg.train.grad_clip is set.
* Loss math in fp32 even when the nets compute in bf16 (losses.py parity).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from vcvits_tpu.config import Config
from vcvits_tpu.dsp.spectrogram import spec_to_mel, stft_magnitude
from vcvits_tpu.models.discriminators import MultiPeriodDiscriminator, MultiScaleDiscriminator
from vcvits_tpu.models.content_encoder import HUBERT_PAD
from vcvits_tpu.models.hubert import HubertModel
from vcvits_tpu.models.synthesizer import SynthesizerSVC
from vcvits_tpu.train.audio_pipeline import smooth_source
from vcvits_tpu.train.losses import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    kl_loss,
)
from vcvits_tpu.train.state import GANTrainState, exponential_epoch_schedule, make_optimizer
from vcvits_tpu.utils.masking import slice_segments


def build_models(cfg: Config, dtype=jnp.float32, hubert_cfg=None):
    gen = SynthesizerSVC.from_config(cfg, dtype=dtype)
    if hubert_cfg is not None:
        gen = gen.clone(hubert_cfg=hubert_cfg)
    mpd = MultiPeriodDiscriminator(
        periods=cfg.model.multi_period_discriminator_periods,
        im2col_first=cfg.train.disc_im2col,
        grouped_pack=cfg.train.disc_grouped_pack,
        time_fold=cfg.train.disc_time_fold, dtype=dtype
    )
    msd = MultiScaleDiscriminator(im2col_first=cfg.train.disc_im2col,
                                  grouped_pack=cfg.train.disc_grouped_pack,
                                  time_fold=cfg.train.disc_time_fold,
                                  dtype=dtype)
    return gen, mpd, msd


def init_params(cfg: Config, rng: jax.Array, batch: Dict[str, jax.Array],
                dtype=jnp.float32, hubert_cfg=None):
    """Initialize generator + discriminator params from an example batch."""
    gen, mpd, msd = build_models(cfg, dtype=dtype, hubert_cfg=hubert_cfg)
    hop = cfg.data.hop_length
    t_spec = batch["y_wav"].shape[1] // hop
    y_spec = jnp.zeros((batch["y_wav"].shape[0], t_spec, cfg.data.spec_channels))
    seg = jnp.zeros((batch["x_wav"].shape[0], cfg.train.segment_size, 1))

    # jit the init: eager layer-by-layer init is dominated by per-op
    # dispatch latency (painful over the TPU tunnel).
    @jax.jit
    def _init(rng):
        k1, k2, k3, k4 = jax.random.split(rng, 4)
        g_vars = gen.init(
            {"params": k1, "sample": k2, "dropout": k3},
            batch["x_wav"], batch["x_wav_lengths"], batch["x_pitch"],
            y_spec, batch["y_wav_lengths"] // hop, batch.get("sid"),
        )
        mpd_vars = mpd.init(k4, seg, seg)
        msd_vars = msd.init(k4, seg, seg)
        return g_vars["params"], {"mpd": mpd_vars["params"], "msd": msd_vars["params"]}

    return _init(rng)


def make_train_step(cfg: Config, dtype=jnp.float32, hubert_cfg=None,
                    steps_per_epoch=None):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    batch (all padded to static bucket shapes):
      x_wav [B, Tx] fp32 @16k, x_wav_lengths [B], x_pitch [B, Tx//320] int,
      y_wav [B, Ty] fp32 @48k, y_wav_lengths [B], sid [B] int.
    """
    gen, mpd, msd = build_models(cfg, dtype=dtype, hubert_cfg=hubert_cfg)
    g_opt = make_optimizer(cfg, freeze_hubert=True, steps_per_epoch=steps_per_epoch)
    d_opt = make_optimizer(cfg, freeze_hubert=False, steps_per_epoch=steps_per_epoch)
    schedule = exponential_epoch_schedule(cfg, steps_per_epoch)

    d = cfg.data
    hop = d.hop_length
    seg_frames = cfg.train.segment_size // hop
    use_pallas = (cfg.train.pallas_frontend
                  and jax.devices()[0].platform == "tpu")

    # Rematerialization: trade HBM for recompute FLOPs in the backward.
    # "dots" keeps only matmul/conv outputs (elementwise chains recomputed);
    # "nothing" recomputes the whole forward. Measured per batch size in
    # tools/bench_train_opts.py.
    remat = cfg.train.remat_policy
    if remat == "none":
        def wrap(f):
            return f
    elif remat in ("dots", "nothing"):
        _pol = (jax.checkpoint_policies.checkpoint_dots if remat == "dots"
                else jax.checkpoint_policies.nothing_saveable)

        def wrap(f, _pol=_pol):
            return jax.checkpoint(f, policy=_pol)
    else:
        raise ValueError(f"unknown remat_policy {remat!r}")

    def features(y_wav):
        """Target spec+mel (frozen; vcvits.py:64-77). On TPU this is the
        fused Pallas kernel (N1): one pass over the frames computes both the
        linear spec and the log-mel. The generated-slice mel (o_mel below)
        stays on the XLA path because it needs gradients and pallas_call
        does not define a VJP — the y path is the dominant cost anyway
        (full-length audio vs 0.34 s segments)."""
        if use_pallas:
            from vcvits_tpu.ops.stft_pallas import spectrogram_mel_fused

            return spectrogram_mel_fused(
                y_wav, d.filter_length, d.n_mel_channels,
                d.target_sampling_rate, hop, d.win_length,
                d.mel_fmin, d.mel_fmax)
        y_spec = stft_magnitude(y_wav, d.filter_length, hop, d.win_length)
        y_mel = spec_to_mel(y_spec, d.filter_length, d.n_mel_channels,
                            d.target_sampling_rate, d.mel_fmin, d.mel_fmax)
        return y_spec, y_mel

    def mel_of(wav):
        """Differentiable mel for the generated slice (XLA path)."""
        spec = stft_magnitude(wav, d.filter_length, hop, d.win_length)
        return spec_to_mel(spec, d.filter_length, d.n_mel_channels,
                           d.target_sampling_rate, d.mel_fmin, d.mel_fmax)

    def train_step(state: GANTrainState, batch: Dict[str, jax.Array], rng: jax.Array):
        r_sample, r_dropout = jax.random.split(rng)

        # --- frozen feature extraction (vcvits.py:61-77, inference_mode) ---
        hubert_features = batch.get("hubert_features")
        if hubert_features is None:
            x_wav = smooth_source(batch["x_wav"], d.filter_length, hop, d.win_length)
            x_wav = jax.lax.stop_gradient(x_wav)
            if cfg.train.share_frozen_hubert:
                # Run the frozen backbone once on the smoothed source and
                # inject the features into both generator forwards below.
                # Exact: the hubert subtree is masked out of the G optimizer
                # (train/state.py:60-84) and HubertModel is dropout-free, so
                # the d_recompute forward would recompute bit-identical
                # features from identical weights.
                hub = HubertModel(gen.resolved_hubert_cfg, dtype=dtype)
                wav16 = jnp.pad(x_wav.astype(dtype),
                                ((0, 0), (HUBERT_PAD, HUBERT_PAD)))
                hubert_features = jax.lax.stop_gradient(
                    hub.apply({"params": state.g_params["enc_p"]["hubert"]},
                              wav16))
        else:
            # preload path: features were dumped from the smoothed source
            # (data/preload.py), so the STFT->iSTFT pipeline AND the frozen
            # HuBERT forward are skipped entirely.
            x_wav = batch["x_wav"]
            hubert_features = jax.lax.stop_gradient(hubert_features)
        y_spec, y_mel = features(batch["y_wav"])
        y_spec = jax.lax.stop_gradient(y_spec)
        y_mel = jax.lax.stop_gradient(y_mel)
        y_spec_lengths = batch["y_wav_lengths"] // hop

        sid = batch.get("sid")

        def _gen_fwd(g_params, r_s, r_d):
            return gen.apply(
                {"params": g_params},
                x_wav.astype(dtype), batch["x_wav_lengths"], batch["x_pitch"],
                y_spec.astype(dtype), y_spec_lengths, sid,
                rng=r_s, deterministic=False,
                hubert_features=(None if hubert_features is None
                                 else hubert_features.astype(dtype)),
                rngs={"dropout": r_d},
            )

        def _disc_fwd(d_params, y_seg, o):
            p = mpd.apply({"params": d_params["mpd"]}, y_seg, o)
            s = msd.apply({"params": d_params["msd"]}, y_seg, o)
            return p, s

        gen_fwd = wrap(_gen_fwd)
        disc_fwd = wrap(_disc_fwd)

        # --- generator update (vcvits.py:85-148) ---
        def g_loss_fn(g_params):
            o, ids, x_mask, y_mask, (z, z_p, m_p, logs_p, m_q, logs_q) = \
                gen_fwd(g_params, r_sample, r_dropout)
            y_seg = slice_segments(
                batch["y_wav"][:, :, None], ids * hop, cfg.train.segment_size
            )
            o32 = o.astype(jnp.float32)

            (p_lr, p_lg, p_fr, p_fg), (s_lr, s_lg, s_fr, s_fg) = disc_fwd(
                state.d_params, y_seg.astype(dtype), o)

            loss_p_fm = feature_loss(p_fr, p_fg)
            loss_s_fm = feature_loss(s_fr, s_fg)
            loss_p_gen, _ = generator_loss(p_lg)
            loss_s_gen, _ = generator_loss(s_lg)

            o_mel = mel_of(o32[:, :, 0])
            y_mel_slice = slice_segments(y_mel, ids, seg_frames)
            loss_mel = jnp.mean(jnp.abs(o_mel - y_mel_slice)) * cfg.train.c_mel
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * cfg.train.c_kl

            total = (loss_s_gen + loss_s_fm) + (loss_p_gen + loss_p_fm) + loss_mel + loss_kl
            aux = {
                "y_hat": o, "ids": ids,
                "loss/g/p_fm": loss_p_fm, "loss/g/s_fm": loss_s_fm,
                "loss/g/p_gen": loss_p_gen, "loss/g/s_gen": loss_s_gen,
                "loss/g/mel": loss_mel, "loss/g/kl": loss_kl,
            }
            return total, aux

        (loss_g, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        grad_norm_g = optax.global_norm(g_grads)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        # --- discriminator update (vcvits.py:151-183) ---
        if cfg.train.d_recompute_forward:
            # reference-exact semantics: fresh forward with POST-update G
            # weights and fresh random slices (costs an extra G forward)
            r_sample2, r_dropout2 = jax.random.split(jax.random.fold_in(rng, 1))
            # _gen_fwd unwrapped: no gradient flows here, so remat would
            # only obscure the program
            o2, ids2, _, _, _ = _gen_fwd(g_params, r_sample2, r_dropout2)
            y_hat_sg = jax.lax.stop_gradient(o2)
            d_ids = ids2
        else:
            y_hat_sg = jax.lax.stop_gradient(aux["y_hat"])
            d_ids = aux["ids"]
        y_seg = slice_segments(
            batch["y_wav"][:, :, None], d_ids * hop, cfg.train.segment_size
        ).astype(dtype)

        def d_loss_fn(d_params):
            (p_lr, p_lg, _, _), (s_lr, s_lg, _, _) = disc_fwd(
                d_params, y_seg, y_hat_sg)
            loss_p, p_r, p_g = discriminator_loss(p_lr, p_lg)
            loss_s, s_r, s_g = discriminator_loss(s_lr, s_lg)
            aux_d = {"loss/d/p": loss_p, "loss/d/s": loss_s}
            # per-sub-discriminator real/gen terms (vcvits.py:166-181)
            aux_d.update({f"loss/d_p_r/{i}": v for i, v in enumerate(p_r)})
            aux_d.update({f"loss/d_p_g/{i}": v for i, v in enumerate(p_g)})
            aux_d.update({f"loss/d_s_r/{i}": v for i, v in enumerate(s_r)})
            aux_d.update({f"loss/d_s_g/{i}": v for i, v in enumerate(s_g)})
            return loss_p + loss_s, aux_d

        (loss_d, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        grad_norm_d = optax.global_norm(d_grads)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = {
            "loss/g/total": loss_g,
            "loss/d/total": loss_d,
            "grad_norm_g": grad_norm_g,
            "grad_norm_d": grad_norm_d,
            "learning_rate": schedule(state.step),
            **{k: v for k, v in aux.items() if k.startswith("loss/")},
            **d_aux,
        }
        new_state = GANTrainState(
            step=state.step + 1,
            g_params=g_params, g_opt_state=g_opt_state,
            d_params=d_params, d_opt_state=d_opt_state,
        )
        return new_state, metrics

    return train_step
