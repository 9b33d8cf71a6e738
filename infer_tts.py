#!/usr/bin/env python
"""Shim: `python infer_tts.py ...` == the installed `vcvits-infer-tts` console
script. The implementation lives in vcvits_tpu.cli.infer_tts."""
from vcvits_tpu.cli.infer_tts import main

if __name__ == "__main__":
    main()
