#!/usr/bin/env python
"""Long-horizon convergence run on a rich synthetic corpus.

20k+ steps of the full GAN system at the production 48k config (bf16,
reference-exact D recompute), on the richest corpus this environment can
generate: multi-speaker speech-like signals with per-speaker formant
sets and F0 ranges, phrase-level F0 declination + random-walk + vibrato
contours, syllabic amplitude envelopes, unvoiced fricative-like noise
bursts, per-clip noise-floor diversity, and silences. Logs mel/KL/fm/
D-balance trajectories to plateau, exercises checkpoint-resume MID-RUN
(a second Trainer process picks up from the latest checkpoint), and
finishes with the shape-tolerant restore on a grown n_speakers
(vcvits.py:265-282 semantics).

Round-4 additions (VERDICT r3 #5): a held-out validation clip per
speaker is evaluated every --eval-interval steps and the objective
metrics (val/mcd_db, val/f0_rmse_cents, val/voicing_f1 — eval.py) are
logged INTO the trajectory, the corpus defaults grew to 32 speakers
with per-clip SNR diversity, and host RSS is tracked throughout (the
r3 run's residual ~0.6 MB/step growth — reports/host_leak_r4.json).

  python tools/convergence_run.py --steps 20000 --out reports/convergence_r4.json
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# persistent XLA compile cache (jax.config route: this runtime pre-imports jax,
# so the env var alone is ignored — see vcvits_tpu/utils/compile_cache.py)
from vcvits_tpu.utils.compile_cache import enable_persistent_cache
enable_persistent_cache()

import numpy as np

SR = 48000


def _rss_mb() -> float:
    """Current process resident set size in MB (Linux /proc, no psutil)."""
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return round(pages * os.sysconf("SC_PAGE_SIZE") / 1e6, 1)
    except Exception:
        return float("nan")


def _formants(rng, sid):
    """Per-speaker vowel space: 3 formant center sets + bandwidths."""
    base = np.array([500.0, 1500.0, 2500.0])
    spread = rng.uniform(0.85, 1.25, 3)
    vowels = []
    for _ in range(4):  # 4 "vowels" per speaker
        centers = base * spread * rng.uniform(0.75, 1.35, 3)
        bws = rng.uniform(60.0, 140.0, 3)
        gains = rng.uniform(0.6, 1.0, 3)
        vowels.append((centers, bws, gains))
    return vowels


def _syllable(rng, f0, dur, vowel, voiced=True):
    """One syllable: harmonic stack shaped by the formant envelope, or a
    fricative-like noise burst; raised-cosine amplitude envelope."""
    n = max(int(SR * dur), 1)
    t = np.arange(n) / SR
    env = 0.5 - 0.5 * np.cos(2 * np.pi * np.minimum(t / dur, 1.0))
    if not voiced:
        x = rng.standard_normal(n)
        # high-pass-ish fricative color via first difference
        x = np.diff(x, prepend=0.0)
        return (0.12 * env * x).astype(np.float32)
    centers, bws, gains = vowel
    # vibrato + micro-jitter on the contour
    f0_t = f0 * (1.0 + 0.02 * np.sin(2 * np.pi * rng.uniform(4.5, 6.5) * t)
                 + 0.003 * rng.standard_normal(n).cumsum() / np.sqrt(n))
    phase = 2 * np.pi * np.cumsum(f0_t) / SR
    x = np.zeros(n)
    n_harm = int(min(6000.0, SR / 2 * 0.9) / max(f0, 1.0))
    for h in range(1, max(n_harm, 2)):
        fh = h * f0
        # formant envelope sampled at the harmonic frequency
        amp = 0.08  # glottal rolloff floor
        for c, bw, g in zip(centers, bws, gains):
            amp += g / (1.0 + ((fh - c) / bw) ** 2)
        amp /= h ** 0.5  # source rolloff
        x += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    x /= max(np.max(np.abs(x)), 1e-6)
    # breathiness
    x += 0.015 * rng.standard_normal(n)
    return (0.35 * env * x).astype(np.float32)


def make_corpus(root: str, n_speakers: int, clips_per_speaker: int,
                seed: int = 1234) -> str:
    from vcvits_tpu.utils.audio_io import write_wav

    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    lines = []
    for sid in range(n_speakers):
        srng = np.random.default_rng(seed + 1000 + sid)
        f0_base = 85.0 * 2 ** (srng.uniform(0.0, 1.6))  # 85..260 Hz
        vowels = _formants(srng, sid)
        for ci in range(clips_per_speaker):
            p = os.path.join(root, f"s{sid}_{ci}.wav")
            lines.append(f"{p}|{sid}")
            if os.path.exists(p):
                continue
            crng = np.random.default_rng(seed + sid * 10007 + ci)
            total = crng.uniform(2.5, 5.5)
            pieces = []
            tpos = 0.0
            f0_phrase = f0_base * crng.uniform(0.9, 1.15)
            while tpos < total:
                dur = crng.uniform(0.08, 0.35)
                kind = crng.random()
                if kind < 0.12:  # silence
                    pieces.append(np.zeros(int(SR * dur), np.float32))
                elif kind < 0.3:  # unvoiced burst
                    pieces.append(_syllable(crng, 0.0, dur * 0.6, None,
                                            voiced=False))
                else:  # voiced syllable with declining phrase F0
                    decl = 1.0 - 0.25 * (tpos / total)
                    f0 = f0_phrase * decl * crng.uniform(0.92, 1.2)
                    vowel = vowels[crng.integers(len(vowels))]
                    pieces.append(_syllable(crng, f0, dur, vowel))
                tpos += dur
            y = np.concatenate(pieces)
            # per-clip noise floor: clean through ~20 dB SNR babble-ish hiss
            snr_db = crng.uniform(18.0, 60.0)
            noise = crng.standard_normal(len(y)).astype(np.float32)
            rms_y = float(np.sqrt(np.mean(y ** 2)) + 1e-9)
            noise *= rms_y / 10 ** (snr_db / 20.0)
            write_wav(p, np.clip(y + noise, -1.0, 1.0), SR)
    # hold out the last clip of each speaker for validation (objective
    # metrics every eval_interval — VERDICT r3 #5)
    val_lines = [ln for ln in lines if ln.split("|")[0].endswith("_0.wav")]
    train_lines = [ln for ln in lines if ln not in set(val_lines)]
    fl = os.path.join(root, "train.txt")
    with open(fl, "w") as f:
        f.write("\n".join(train_lines) + "\n")
    vfl = os.path.join(root, "val.txt")
    with open(vfl, "w") as f:
        f.write("\n".join(val_lines) + "\n")
    return fl, vfl


def build_cfg(fl: str, root: str, n_speakers: int, batch: int,
              ckpt_interval: int, vfl: str = "", eval_interval: int = 10 ** 9):
    from vcvits_tpu.config import Config

    cfg = Config()
    return dataclasses.replace(
        cfg,
        train=dataclasses.replace(
            cfg.train, batch_size=batch, log_interval=100,
            eval_interval=eval_interval, checkpoint_interval=ckpt_interval,
            max_epochs=10 ** 6),
        data=dataclasses.replace(
            cfg.data, training_files=fl, validation_files=vfl,
            n_speakers=max(n_speakers, 8),
            cache_dir=os.path.join(root, "cache")),
    )


PARTIAL_OUT = [None]  # set by main(): progressive trajectory dump path
_DONE_LOG: list = []      # completed phases' trajectory points
_DONE_VAL: list = []      # completed phases' val points


def _dump_partial(log, val_log):
    """Write the in-flight trajectory so a preempted run still leaves
    evidence (the full report is assembled only at the end)."""
    if PARTIAL_OUT[0] is None:
        return
    try:
        with open(PARTIAL_OUT[0], "w") as f:
            json.dump({"partial": True,
                       "trajectory": _DONE_LOG + log,
                       "val_trajectory": _DONE_VAL + val_log}, f)
    except OSError:
        pass


def run_phase(cfg, fl: str, workdir: str, max_steps: int):
    import jax.numpy as jnp

    from vcvits_tpu.train.trainer import Trainer

    log = []
    val_log = []
    trainer = Trainer(cfg, workdir=workdir, dtype=jnp.bfloat16)
    orig = trainer.tb.summarize

    def spy(step, scalars=None, **kw):
        if scalars and "val/mcd_db" in scalars:
            val_log.append({"step": step, "host_rss_mb": _rss_mb(),
                            **{k: float(v) for k, v in scalars.items()}})
        if scalars and "loss/g/mel" in scalars:
            log.append({
                "step": step,
                "mel": float(scalars["loss/g/mel"]),
                "kl": float(scalars.get("loss/g/kl", np.nan)),
                # fm/adv are logged per-sub-discriminator (p_/s_ prefixes)
                "fm": float(scalars.get("loss/g/p_fm", np.nan))
                + float(scalars.get("loss/g/s_fm", np.nan)),
                "g_adv": float(scalars.get("loss/g/p_gen", np.nan))
                + float(scalars.get("loss/g/s_gen", np.nan)),
                "g_total": float(scalars["loss/g/total"]),
                "d_total": float(scalars["loss/d/total"]),
                "steps_per_sec": float(scalars.get("steps_per_sec", np.nan)),
                # host anon RSS in MB: the watchdog stat for the h2d
                # staging leak this run was first killed by (ROADMAP r3
                # item 9) — flat = the device cache is doing its job
                "host_rss_mb": _rss_mb(),
            })
            _dump_partial(log, val_log)
        return orig(step, scalars=scalars, **kw)

    trainer.tb.summarize = spy
    trainer.fit(train_files=fl, max_steps=max_steps)
    _DONE_LOG.extend(log)
    _DONE_VAL.extend(val_log)
    return log, val_log


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--speakers", type=int, default=32)
    ap.add_argument("--clips", type=int, default=8)
    ap.add_argument("--eval-interval", type=int, default=500)
    ap.add_argument("--root", default="/tmp/conv_r4")
    ap.add_argument("--out", default="reports/convergence_r4.json")
    ap.add_argument("--tb-out", default="reports/convergence_r4_tb")
    ap.add_argument("--phase3-only", action="store_true",
                    help="skip the training phases and run only the "
                         "grown-speaker tolerant-restore check against the "
                         "checkpoints already in <root>/logs; writes "
                         "<out> with just the grown_speakers record")
    args = ap.parse_args()

    t0 = time.time()
    PARTIAL_OUT[0] = args.out + ".partial"
    corpus_root = os.path.join(args.root, "corpus")
    fl, vfl = make_corpus(corpus_root, args.speakers, args.clips)
    n_clips = sum(1 for _ in open(fl))
    print(f"corpus: {n_clips} train clips (+{args.speakers} val), "
          f"{args.speakers} speakers", flush=True)

    workdir = os.path.join(args.root, "logs")
    cfg = build_cfg(fl, args.root, args.speakers, args.batch,
                    ckpt_interval=2000, vfl=vfl,
                    eval_interval=args.eval_interval)

    # Phase 1: first half. Phase 2: a FRESH Trainer auto-resumes from the
    # latest checkpoint (the crash-and-resume contract, §5.3) and runs to
    # the full step count.
    half = args.steps // 2
    if not args.phase3_only:
        log1, vlog1 = run_phase(cfg, fl, workdir, half)
        print(f"phase 1 done at ~{half} steps ({len(log1)} log points)",
              flush=True)
        log2, vlog2 = run_phase(cfg, fl, workdir, args.steps)
        resume_start = log2[0]["step"] if log2 else None
        print(f"phase 2 resumed (first logged step {resume_start}) "
              f"-> {args.steps}", flush=True)
    else:
        log1 = log2 = vlog1 = vlog2 = []
        resume_start = None

    traj = log1 + log2
    val_traj = vlog1 + vlog2
    mels = [p["mel"] for p in traj]
    d_tot = [p["d_total"] for p in traj]

    # Phase 3: shape-tolerant restore on a grown speaker table, then a few
    # hundred steps to show training continues finite. The grown size must
    # EXCEED the run's own n_speakers or no shape mismatch exists — the
    # normal restore path then keeps the 20k step counter and fit() exits
    # with zero steps (the r5 run's --speakers 32 hit exactly this against
    # the old hard-coded 32).
    import jax.numpy as jnp

    from vcvits_tpu.train.trainer import Trainer

    n_grown = args.speakers + 16
    cfg_grown = build_cfg(fl, args.root, args.speakers, args.batch,
                          ckpt_interval=10 ** 9)
    cfg_grown = dataclasses.replace(
        cfg_grown, data=dataclasses.replace(cfg_grown.data,
                                            n_speakers=n_grown))
    grow_dir = os.path.join(args.root, "logs_grown")
    shutil.rmtree(grow_dir, ignore_errors=True)
    os.makedirs(grow_dir, exist_ok=True)
    # seed the grown workdir with the run's checkpoints
    shutil.copytree(os.path.join(workdir, "checkpoints"),
                    os.path.join(grow_dir, "checkpoints"))
    # tolerant restore resets the optimizer AND the step counter
    # (vcvits.py:265-282 fine-tune semantics), so this phase runs 300
    # fresh steps on the restored weights with the grown speaker table
    log3, _ = run_phase(cfg_grown, fl, grow_dir, 300)
    grown_ok = bool(log3) and all(np.isfinite(p["g_total"]) for p in log3)
    print(f"grown-speaker tolerant restore ({args.speakers} -> {n_grown}): "
          f"{len(log3)} points, finite={grown_ok}", flush=True)

    # plateau statistics: last-10% mel vs the 25-35% window
    k = max(len(mels) // 10, 1)
    early = mels[len(mels) // 4: len(mels) // 4 + k]
    late = mels[-k:]
    report = {
        "steps": args.steps,
        "batch": args.batch,
        "corpus": {"clips": n_clips, "speakers": args.speakers,
                   "sr": SR, "style": "formant-synth multi-speaker"},
        "bf16": True,
        "d_recompute_forward": True,
        "trajectory": traj,
        "val_trajectory": val_traj,
        "resume": {"phase1_end": half, "phase2_first_logged": resume_start},
        "grown_speakers": {"n_speakers": n_grown, "steps": 300,
                           "finite": grown_ok,
                           "points": log3[:5]},
        "mel_early_mean": float(np.mean(early)) if early else None,
        "mel_late_mean": float(np.mean(late)) if late else None,
        "mel_min": float(np.min(mels)) if mels else None,
        # objective-metric plateau stats (first vs last quarter of val evals)
        "val_first_quarter": {
            k: float(np.mean([p[k] for p in val_traj[: max(len(val_traj) // 4, 1)]
                              if k in p]))
            for k in ("val/mcd_db", "val/f0_rmse_cents", "val/voicing_f1")
            if any(k in p for p in val_traj)
        },
        "val_last_quarter": {
            k: float(np.mean([p[k] for p in val_traj[-max(len(val_traj) // 4, 1):]
                              if k in p]))
            for k in ("val/mcd_db", "val/f0_rmse_cents", "val/voicing_f1")
            if any(k in p for p in val_traj)
        },
        "host_rss_first_mb": traj[0]["host_rss_mb"] if traj else None,
        "host_rss_last_mb": traj[-1]["host_rss_mb"] if traj else None,
        "d_total_late_mean": float(np.mean(d_tot[-k:])) if d_tot else None,
        "all_finite": bool(np.isfinite(mels).all() and np.isfinite(d_tot).all()),
        "wall_s": round(time.time() - t0, 1),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    # drop the progressive dump now that the final report exists (a stale
    # "partial": true file alongside it reads as a preempted run)
    if PARTIAL_OUT[0] and os.path.exists(PARTIAL_OUT[0]):
        os.remove(PARTIAL_OUT[0])
    PARTIAL_OUT[0] = None
    # TB evidence (scalars only — no audio/eval in this run): copy event
    # files next to the report
    shutil.rmtree(args.tb_out, ignore_errors=True)
    shutil.copytree(os.path.join(workdir, "tb"), args.tb_out)
    mel_span = ("no training phases (--phase3-only)"
                if report["mel_early_mean"] is None else
                f"mel {report['mel_early_mean']:.2f} -> "
                f"{report['mel_late_mean']:.2f}")
    print(f"wrote {args.out} (+ TB events in {args.tb_out}); {mel_span}",
          flush=True)


if __name__ == "__main__":
    main()
