"""Jitted GAN train step for the TTS path (VITS training).

Capability parity with /root/reference/vits/light/vits.py:23-236 (the VITS
LightningModule): MAS-aligned prior, SDP duration NLL (c_dur), pitch/energy
MSE (c_pitch/c_energy, FastPitch-style), mel/KL/fm/adv losses, two AdamW
optimizers — here as one pure XLA program like the VC step. The reference's
TTS path cannot run as shipped (broken imports, SURVEY.md §2.5); this one
does.

Batch layout (static bucket shapes):
  text [B, T_x] int ids, text_lengths [B],
  y_wav [B, T_y*hop] fp32 target audio, y_wav_lengths [B],
  pitch [B, T_frames] fp32 frame-level F0 target (0 = unvoiced),
  sid [B] int.
Energy targets are derived in-step from the linear spectrogram (L2 per
frame, log-compressed), the standard FastPitch definition.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import optax

from vcvits_tpu.config import Config
from vcvits_tpu.dsp.spectrogram import spec_to_mel, stft_magnitude
from vcvits_tpu.models.discriminators import MultiPeriodDiscriminator, MultiScaleDiscriminator
from vcvits_tpu.models.synthesizer_tts import SynthesizerTTS
from vcvits_tpu.text.symbols import symbols
from vcvits_tpu.train.losses import discriminator_loss, feature_loss, generator_loss, kl_loss
from vcvits_tpu.train.state import GANTrainState, exponential_epoch_schedule, make_optimizer
from vcvits_tpu.utils.masking import slice_segments

# loss coefficients beyond the shared c_mel/c_kl (vits.py:72-90); the
# reference reads them from its (unshipped) TTS config
C_P_FM = 1.0
C_S_FM = 1.0
C_DUR = 1.0
C_PITCH = 0.1
C_ENERGY = 0.1


def build_tts_models(cfg: Config, dtype=jnp.float32, n_vocab: int = None):
    m = cfg.model
    gen = SynthesizerTTS(
        n_vocab=n_vocab or len(symbols),
        spec_channels=cfg.data.spec_channels,
        segment_size=cfg.train.segment_size // cfg.data.hop_length,
        inter_channels=m.inter_channels,
        hidden_channels=m.hidden_channels,
        filter_channels=m.filter_channels,
        n_heads=m.n_heads,
        n_layers=m.n_layers,
        kernel_size=m.kernel_size,
        p_dropout=m.p_dropout,
        resblock=m.resblock,
        resblock_kernel_sizes=m.resblock_kernel_sizes,
        resblock_dilation_sizes=m.resblock_dilation_sizes,
        upsample_rates=m.upsample_rates,
        upsample_initial_channel=m.upsample_initial_channel,
        upsample_kernel_sizes=m.upsample_kernel_sizes,
        n_speakers=cfg.data.n_speakers,
        gin_channels=m.gin_channels,
        use_sdp=True,
        dtype=dtype,
    )
    mpd = MultiPeriodDiscriminator(periods=m.multi_period_discriminator_periods, dtype=dtype)
    msd = MultiScaleDiscriminator(dtype=dtype)
    return gen, mpd, msd


def init_tts_params(cfg: Config, rng: jax.Array, batch: Dict, dtype=jnp.float32,
                    n_vocab: int = None):
    gen, mpd, msd = build_tts_models(cfg, dtype=dtype, n_vocab=n_vocab)
    hop = cfg.data.hop_length
    t_spec = batch["y_wav"].shape[1] // hop
    y_spec = jnp.zeros((batch["y_wav"].shape[0], t_spec, cfg.data.spec_channels))
    seg = jnp.zeros((batch["text"].shape[0], cfg.train.segment_size, 1))

    @jax.jit
    def _init(r):
        k1, k2, k3, k4 = jax.random.split(r, 4)
        g_vars = gen.init(
            {"params": k1, "sample": k2, "dropout": k3},
            batch["text"], batch["text_lengths"], y_spec,
            batch["y_wav_lengths"] // hop, batch.get("sid"),
        )
        return (
            g_vars["params"],
            {"mpd": mpd.init(k4, seg, seg)["params"],
             "msd": msd.init(k4, seg, seg)["params"]},
        )

    return _init(rng)


def make_tts_train_step(cfg: Config, dtype=jnp.float32, n_vocab: int = None,
                        steps_per_epoch=None):
    gen, mpd, msd = build_tts_models(cfg, dtype=dtype, n_vocab=n_vocab)
    g_opt = make_optimizer(cfg, freeze_hubert=False, steps_per_epoch=steps_per_epoch)
    d_opt = make_optimizer(cfg, freeze_hubert=False, steps_per_epoch=steps_per_epoch)
    schedule = exponential_epoch_schedule(cfg, steps_per_epoch)
    d = cfg.data
    hop = d.hop_length
    seg_frames = cfg.train.segment_size // hop

    def features(y_wav):
        y_spec = stft_magnitude(y_wav, d.filter_length, hop, d.win_length)
        y_mel = spec_to_mel(y_spec, d.filter_length, d.n_mel_channels,
                            d.target_sampling_rate, d.mel_fmin, d.mel_fmax)
        return y_spec, y_mel

    def train_step(state: GANTrainState, batch: Dict, rng: jax.Array):
        r_model, r_drop = jax.random.split(rng)
        y_spec, y_mel = features(batch["y_wav"])
        y_spec = jax.lax.stop_gradient(y_spec)
        y_mel = jax.lax.stop_gradient(y_mel)
        y_spec_lengths = batch["y_wav_lengths"] // hop
        # FastPitch-style energy target: per-frame spectral L2, log-compressed
        energy_tgt = jnp.log1p(jnp.linalg.norm(y_spec, axis=-1))[..., None]
        pitch_tgt = batch["pitch"][..., None].astype(jnp.float32)

        def g_loss_fn(g_params):
            (o, l_length, pitch_pred, energy_pred, attn, ids, x_mask, y_mask,
             (z, z_p, m_p, logs_p, m_q, logs_q)) = gen.apply(
                {"params": g_params},
                batch["text"], batch["text_lengths"],
                y_spec.astype(dtype), y_spec_lengths, batch.get("sid"),
                rng=r_model, deterministic=False, rngs={"dropout": r_drop},
            )
            y_seg = slice_segments(batch["y_wav"][:, :, None], ids * hop,
                                   cfg.train.segment_size)
            o32 = o.astype(jnp.float32)

            p_lr, p_lg, p_fr, p_fg = mpd.apply({"params": state.d_params["mpd"]},
                                               y_seg.astype(dtype), o)
            s_lr, s_lg, s_fr, s_fg = msd.apply({"params": state.d_params["msd"]},
                                               y_seg.astype(dtype), o)
            loss_p_fm = feature_loss(p_fr, p_fg) * C_P_FM
            loss_s_fm = feature_loss(s_fr, s_fg) * C_S_FM
            loss_p_gen, _ = generator_loss(p_lg)
            loss_s_gen, _ = generator_loss(s_lg)

            _, o_mel = features(o32[:, :, 0])
            y_mel_slice = slice_segments(y_mel, ids, seg_frames)
            loss_mel = jnp.mean(jnp.abs(o_mel - y_mel_slice)) * cfg.train.c_mel
            loss_kl = kl_loss(z_p, logs_q, m_p, logs_p, y_mask) * cfg.train.c_kl
            loss_dur = jnp.sum(l_length.astype(jnp.float32)) * C_DUR

            t_frames = min(pitch_tgt.shape[1], pitch_pred.shape[1])
            ym32 = y_mask.astype(jnp.float32)
            loss_pitch = jnp.mean(
                ((pitch_pred[:, :t_frames] - pitch_tgt[:, :t_frames]) ** 2)
                * ym32[:, :t_frames]
            ) * C_PITCH
            loss_energy = jnp.mean(
                ((energy_pred - energy_tgt.astype(energy_pred.dtype)) ** 2) * ym32
            ) * C_ENERGY

            total = ((loss_s_gen + loss_s_fm) + (loss_p_gen + loss_p_fm)
                     + loss_kl + loss_mel + loss_dur + loss_pitch + loss_energy)
            aux = {
                "y_hat": o, "ids": ids,
                "loss/g/p_fm": loss_p_fm, "loss/g/s_fm": loss_s_fm,
                "loss/g/p_gen": loss_p_gen, "loss/g/s_gen": loss_s_gen,
                "loss/g/mel": loss_mel, "loss/g/kl": loss_kl,
                "loss/g/dur": loss_dur, "loss/g/pitch": loss_pitch,
                "loss/g/energy": loss_energy,
            }
            return total, aux

        (loss_g, aux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(state.g_params)
        grad_norm_g = optax.global_norm(g_grads)
        g_updates, g_opt_state = g_opt.update(g_grads, state.g_opt_state, state.g_params)
        g_params = optax.apply_updates(state.g_params, g_updates)

        y_hat_sg = jax.lax.stop_gradient(aux["y_hat"])
        y_seg = slice_segments(batch["y_wav"][:, :, None], aux["ids"] * hop,
                               cfg.train.segment_size).astype(dtype)

        def d_loss_fn(d_params):
            p_lr, p_lg, _, _ = mpd.apply({"params": d_params["mpd"]}, y_seg, y_hat_sg)
            s_lr, s_lg, _, _ = msd.apply({"params": d_params["msd"]}, y_seg, y_hat_sg)
            lp, _, _ = discriminator_loss(p_lr, p_lg)
            ls, _, _ = discriminator_loss(s_lr, s_lg)
            return lp + ls, {"loss/d/p": lp, "loss/d/s": ls}

        (loss_d, d_aux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(state.d_params)
        grad_norm_d = optax.global_norm(d_grads)
        d_updates, d_opt_state = d_opt.update(d_grads, state.d_opt_state, state.d_params)
        d_params = optax.apply_updates(state.d_params, d_updates)

        metrics = {
            "loss/g/total": loss_g, "loss/d/total": loss_d,
            "grad_norm_g": grad_norm_g, "grad_norm_d": grad_norm_d,
            "learning_rate": schedule(state.step),
            **{k: v for k, v in aux.items() if k.startswith("loss/")},
            **d_aux,
        }
        return GANTrainState(
            step=state.step + 1,
            g_params=g_params, g_opt_state=g_opt_state,
            d_params=d_params, d_opt_state=d_opt_state,
        ), metrics

    return train_step
