#!/usr/bin/env python
"""Shim: `python convert_checkpoint.py ...` == the installed `vcvits-convert-checkpoint` console
script. The implementation lives in vcvits_tpu.cli.convert_checkpoint."""
from vcvits_tpu.cli.convert_checkpoint import main

if __name__ == "__main__":
    main()
