#!/usr/bin/env python
"""Shim: `python train.py ...` == the installed `vcvits-train` console
script. The implementation lives in vcvits_tpu.cli.train."""
from vcvits_tpu.cli.train import main

if __name__ == "__main__":
    main()
