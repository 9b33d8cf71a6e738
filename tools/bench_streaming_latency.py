#!/usr/bin/env python
"""Streaming latency/quality frontier (VERDICT r3 #6).

The exact incremental mode's ~950 ms lookahead is forced, not chosen: the
flow + decoder stack is shift-equivariant (convs, delays, elementwise ops,
aligned adds), so ANY scheme reproducing the offline output exactly must
wait for the full right receptive field. Lower latency therefore buys
boundary-approximation error. This tool measures that trade on the real
chip: each operating point streams the same speech-like utterance at
noise_scale=0 (deterministic prior mean path — so the streamed-vs-offline
difference is PURELY context truncation, not sampling noise) and reports

  * algorithmic latency = chunk + right ctx (+ pipeline delay when exact),
  * median per-chunk wall ms and streaming RTF,
  * quality vs the offline rendering: log-mel L1 and MCD (sample-aligned,
    no DTW — the clips are the same utterance on the same clock).

The <300 ms row (chunk 0.16 s + ctx 0.08 s = 240 ms) is the low-latency
operating point the reference cannot express at all (its infer.py:86
truncates long inputs instead of streaming).

Run (TPU):  python tools/bench_streaming_latency.py
Writes reports/streaming_latency_r5.json; table lives in docs/streaming.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np


def speech_like(secs: float, sr: int, seed: int = 0) -> np.ndarray:
    """Harmonic source with a moving F0 contour + formant envelope + noise
    bursts — enough spectral/pitch structure that boundary errors show up
    in mel/MCD instead of vanishing into a stationary tone."""
    rng = np.random.default_rng(seed)
    n = int(secs * sr)
    t = np.arange(n) / sr
    # F0 glides 110 -> 220 Hz with vibrato and a pause in the middle
    f0 = 165 + 55 * np.sin(2 * np.pi * 0.35 * t) + 6 * np.sin(2 * np.pi * 5.0 * t)
    phase = 2 * np.pi * np.cumsum(f0) / sr
    voiced = np.zeros(n)
    formants = [(700, 0.9), (1220, 0.5), (2600, 0.25)]
    for h in range(1, 12):
        fh = f0 * h
        amp = sum(a * np.exp(-0.5 * ((fh - fc) / 250.0) ** 2) for fc, a in formants)
        amp = amp * (fh < sr / 2 - 200)
        voiced += amp * np.sin(h * phase)
    # amplitude envelope: syllabic gating (~3 Hz) with an unvoiced gap
    env = 0.5 * (1 + np.sin(2 * np.pi * 2.8 * t - 1.2)) ** 1.5
    env[int(0.45 * n): int(0.55 * n)] *= 0.05
    sig = voiced * env + 0.01 * rng.standard_normal(n)
    return (0.5 * sig / np.max(np.abs(sig))).astype(np.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--secs", type=float, default=8.0)
    ap.add_argument("--out", default="reports/streaming_latency_r5.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vcvits_tpu.config import Config
    from vcvits_tpu.dsp.pitch import coarse_f0, estimate_pitch
    from vcvits_tpu.dsp.spectrogram import mel_spectrogram
    from vcvits_tpu.eval import mel_cepstral_distortion
    from vcvits_tpu.infer import VoiceConverter
    from vcvits_tpu.models.synthesizer import SynthesizerSVC
    from vcvits_tpu.streaming import StreamingConverter

    cfg = Config()
    d = cfg.data
    gen = SynthesizerSVC.from_config(cfg)
    t0 = 7680
    k = jax.random.PRNGKey(0)
    variables = gen.init(
        {"params": k, "sample": k},
        jnp.zeros((1, t0)), jnp.array([t0]),
        jnp.zeros((1, t0 // 320), jnp.int32), jnp.array([0]),
        method=SynthesizerSVC.infer,
    )
    vc = VoiceConverter(cfg, variables["params"])

    src = speech_like(args.secs, d.source_sampling_rate)
    # offline reference rendering (same deterministic path)
    f0 = estimate_pitch(src, sr=d.source_sampling_rate, n_fft=d.filter_length,
                        win_length=d.win_length, hop_length=320)
    pitch = coarse_f0(f0, f0_bin=d.num_pitch)
    offline = vc.convert_array(src, pitch, 1, noise_scale=0.0)

    def log_mel(wav: np.ndarray) -> np.ndarray:
        m = mel_spectrogram(jnp.asarray(wav)[None, :], d.filter_length,
                            d.n_mel_channels, d.target_sampling_rate,
                            d.hop_length, d.win_length, fmin=d.mel_fmin,
                            fmax=d.mel_fmax)
        return np.asarray(m)[0]

    points = [
        ("windowed", 2.0, 0.16, False),     # throughput default (r2)
        ("windowed", 0.32, 0.16, False),    # interactive (r2 table)
        ("windowed", 0.16, 0.16, False),    # 320 ms
        ("windowed", 0.16, 0.08, False),    # 240 ms — the <300 ms point
        ("incremental", 0.32, 0.16, True),  # exact (lookahead-bound)
    ]

    sr = d.source_sampling_rate
    rows = []
    for mode, chunk_s, ctx_s, inc in points:
        sc = StreamingConverter(vc, speaker_id=1, chunk_seconds=chunk_s,
                                context_seconds=ctx_s, noise_scale=0.0,
                                incremental=inc)
        # ---- quality pass (also warms the compile) ----
        pieces = list(sc.push(src)) + list(sc.flush())
        streamed = np.concatenate(pieces) if pieces else np.zeros(1, np.float32)
        n = min(len(streamed), len(offline))
        mel_l1 = float(np.abs(log_mel(streamed[:n]) - log_mel(offline[:n])).mean())
        mcd = mel_cepstral_distortion(offline[:n], streamed[:n],
                                      d.target_sampling_rate, use_dtw=False)
        # ---- timing pass (steady state, one chunk per push) ----
        sc.reset()
        list(sc.push(src[: sc.ctx]))
        consumed, times = sc.ctx, []
        while consumed + sc.chunk <= len(src):
            t1 = time.perf_counter()
            for _ in sc.push(src[consumed: consumed + sc.chunk]):
                pass
            times.append(time.perf_counter() - t1)
            consumed += sc.chunk
        med = float(np.median(times[1:] if len(times) > 1 else times))
        chunk_audio = sc.chunk / sr
        lat_ms = (sc.chunk + sc.ctx) / sr * 1000.0
        if inc:
            lat_ms += sc._sfd.delay_samples / d.target_sampling_rate * 1000.0
        rows.append({
            "mode": mode,
            "chunk_ms": round(sc.chunk / sr * 1000.0),
            "right_ctx_ms": round(sc.ctx / sr * 1000.0),
            "alg_latency_ms": round(lat_ms),
            "median_chunk_ms": round(med * 1000.0, 1),
            "rtf": round(chunk_audio / med, 2),
            "mel_l1_vs_offline": round(mel_l1, 4),
            "mcd_db_vs_offline": round(mcd, 3),
        })
        print(json.dumps(rows[-1]), flush=True)

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump({"secs": args.secs, "noise_scale": 0.0,
                   "device": str(jax.devices()), "points": rows}, f, indent=1)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
