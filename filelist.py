#!/usr/bin/env python
"""Shim: `python filelist.py ...` == the installed `vcvits-filelist` console
script. The implementation lives in vcvits_tpu.cli.filelist."""
from vcvits_tpu.cli.filelist import main

if __name__ == "__main__":
    main()
