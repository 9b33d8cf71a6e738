#!/usr/bin/env python
"""Objective evaluation CLI: MCD / F0-RMSE / voicing-F1 over clip pairs.

The reference has no objective evaluation at all (its only quality signal
is TensorBoard mel images + audio, vits/light/vcvits.py:185-245); this
scores converted audio against references with the standard VC metrics
(vcvits_tpu/eval.py), using the framework's own DSP front-end.

  # one pair
  python tools/evaluate.py --ref ref.wav --gen converted.wav

  # directories matched by basename
  python tools/evaluate.py --ref-dir dataset/eval_ref --gen-dir out/

Prints one JSON object per pair plus an aggregate line (mean MCD,
RMS-combined F0 error, pooled voicing F1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vcvits_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

import numpy as np  # noqa: E402


def _load(path: str, sr: int | None):
    from vcvits_tpu.dsp.resample import resample
    from vcvits_tpu.utils.audio_io import read_wav

    wav, wav_sr = read_wav(path)
    if sr is not None and wav_sr != sr:
        wav = resample(wav, wav_sr, sr)
        wav_sr = sr
    return np.asarray(wav, np.float32), wav_sr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", help="reference wav")
    ap.add_argument("--gen", help="generated/converted wav")
    ap.add_argument("--ref-dir", help="directory of reference wavs")
    ap.add_argument("--gen-dir", help="directory of generated wavs "
                                      "(matched to --ref-dir by basename)")
    ap.add_argument("--sr", type=int, default=None,
                    help="resample both clips to this rate before scoring "
                         "(default: the reference clip's rate)")
    ap.add_argument("--pitch-sr", type=int, default=16000,
                    help="track F0 at this rate (16 kHz = the training "
                         "front-end; 0 = track at the scoring rate)")
    ap.add_argument("--no-dtw", action="store_true",
                    help="frames are sample-aligned; skip DTW for MCD")
    args = ap.parse_args()

    pairs = []
    if args.ref and args.gen:
        pairs.append((args.ref, args.gen))
    elif args.ref_dir and args.gen_dir:
        gen_by_name = {os.path.basename(p): os.path.join(args.gen_dir, p)
                       for p in sorted(os.listdir(args.gen_dir))
                       if p.endswith(".wav")}
        for p in sorted(os.listdir(args.ref_dir)):
            if p.endswith(".wav") and p in gen_by_name:
                pairs.append((os.path.join(args.ref_dir, p), gen_by_name[p]))
        missing = [p for p in sorted(os.listdir(args.ref_dir))
                   if p.endswith(".wav") and p not in gen_by_name]
        if missing:
            print(f"# skipped {len(missing)} refs with no generated match: "
                  f"{missing[:5]}{'...' if len(missing) > 5 else ''}",
                  file=sys.stderr)
    else:
        ap.error("need --ref/--gen or --ref-dir/--gen-dir")
    if not pairs:
        ap.error("no pairs to evaluate")

    from vcvits_tpu.eval import evaluate_pair

    rows = []
    for ref_path, gen_path in pairs:
        ref, sr = _load(ref_path, args.sr)
        gen, _ = _load(gen_path, sr)
        m = evaluate_pair(ref, gen, sr, pitch_sr=args.pitch_sr or None,
                          use_dtw=not args.no_dtw)
        m["pair"] = [ref_path, gen_path]
        rows.append(m)
        print(json.dumps(m))

    cents = [r["f0_rmse_cents"] for r in rows
             if np.isfinite(r.get("f0_rmse_cents", float("nan")))]
    agg = {
        "pairs": len(rows),
        "mcd_db_mean": round(float(np.mean([r["mcd_db"] for r in rows])), 4),
        "f0_rmse_cents_rms": round(
            float(np.sqrt(np.mean(np.square(cents)))), 2) if cents else None,
        "voicing_f1_mean": round(
            float(np.mean([r["voicing_f1"] for r in rows])), 4),
    }
    print(json.dumps({"aggregate": agg}))


if __name__ == "__main__":
    main()
