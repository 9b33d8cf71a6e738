#!/usr/bin/env python
"""Shim: `python serve.py ...` == the installed `vcvits-serve` console
script. The implementation lives in vcvits_tpu.cli.serve."""
from vcvits_tpu.cli.serve import main

if __name__ == "__main__":
    main()
