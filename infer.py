#!/usr/bin/env python
"""Shim: `python infer.py ...` == the installed `vcvits-infer` console
script. The implementation lives in vcvits_tpu.cli.infer."""
from vcvits_tpu.cli.infer import main

if __name__ == "__main__":
    main()
