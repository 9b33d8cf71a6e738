"""Command-line entry points (installed as console scripts — pyproject.toml).

Each module here is also reachable as a repo-root shim (`python train.py ...`)
for capability parity with the reference's flat script layout
(/root/reference/train.py, infer.py, filelist.py, split.py).
"""
