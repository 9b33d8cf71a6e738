#!/usr/bin/env python
"""Train/valid/test splitter CLI (parity with /root/reference/split.py:11-28:
shuffle seed 1234, hold out 10 valid + 10 test).

  python split.py --filelist filelists/audio_filelist.txt
"""

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--filelist", default="filelists/audio_filelist.txt")
    parser.add_argument("--seed", type=int, default=1234)
    parser.add_argument("--n-valid", type=int, default=10)
    parser.add_argument("--n-test", type=int, default=10)
    args = parser.parse_args()

    from vcvits_tpu.data.filelist import split_filelist

    with open(args.filelist, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    train, valid, test = split_filelist(lines, args.seed, args.n_valid, args.n_test)
    base = args.filelist.rsplit(".", 1)[0]
    for name, subset in [("train", train), ("valid", valid), ("test", test)]:
        out = f"{base}_{name}.txt"
        with open(out, "w", encoding="utf-8") as f:
            f.write("\n".join(subset) + ("\n" if subset else ""))
        print(f"{out}: {len(subset)}")


if __name__ == "__main__":
    main()
