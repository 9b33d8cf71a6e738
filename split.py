#!/usr/bin/env python
"""Shim: `python split.py ...` == the installed `vcvits-split` console
script. The implementation lives in vcvits_tpu.cli.split."""
from vcvits_tpu.cli.split import main

if __name__ == "__main__":
    main()
