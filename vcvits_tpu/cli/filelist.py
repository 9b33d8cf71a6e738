#!/usr/bin/env python
"""Filelist generator CLI (parity with /root/reference/filelist.py:14-42).

  python filelist.py --dataset dataset --out filelists/filelist.txt
"""

import argparse
import os


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="dataset")
    parser.add_argument("--out", default="filelists/audio_filelist.txt")
    parser.add_argument("--speakers-out", default=None)
    parser.add_argument("--min-files", type=int, default=50)
    parser.add_argument("--min-seconds", type=float, default=3.0)
    args = parser.parse_args()

    from vcvits_tpu.data.filelist import generate_filelist

    lines, speakers = generate_filelist(
        args.dataset, min_files_per_speaker=args.min_files, min_seconds=args.min_seconds
    )
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w", encoding="utf-8") as f:
        f.write("\n".join(lines) + ("\n" if lines else ""))
    speakers_out = args.speakers_out or args.out.replace(".txt", "_speakers.txt")
    with open(speakers_out, "w", encoding="utf-8") as f:
        f.write("\n".join(speakers) + ("\n" if speakers else ""))
    print(f"{len(lines)} clips across {len(speakers)} speakers -> {args.out}")


if __name__ == "__main__":
    main()
