#!/usr/bin/env python
"""Shim: `python train_tts.py ...` == the installed `vcvits-train-tts` console
script. The implementation lives in vcvits_tpu.cli.train_tts."""
from vcvits_tpu.cli.train_tts import main

if __name__ == "__main__":
    main()
