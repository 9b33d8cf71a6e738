"""Experiment provenance: git-hash pinning + per-run file logger.

Capability parity with /root/reference/vits/utils.py:203-236
(check_git_hash, get_logger): record the source commit next to the run's
checkpoints and warn when resuming with different code, and mirror training
logs into `<model_dir>/train.log`.
"""

from __future__ import annotations

import logging
import os
import subprocess

logger = logging.getLogger(__name__)


def current_git_hash(source_dir: str | None = None) -> str | None:
    source_dir = source_dir or os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    )
    try:
        out = subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=source_dir,
            capture_output=True, text=True, timeout=10,
        )
    except Exception:
        return None
    if out.returncode != 0:
        return None
    return out.stdout.strip() or None


def check_git_hash(model_dir: str) -> None:
    """Save the current commit to `<model_dir>/githash`; warn if a saved run
    was produced by different code (utils.py:203-219)."""
    cur = current_git_hash()
    if cur is None:
        logger.warning(
            "not a git repository; git hash comparison skipped")
        return
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, "githash")
    if os.path.exists(path):
        with open(path) as f:
            saved = f.read().strip()
        if saved != cur:
            logger.warning(
                "git hash differs from the one this run was started with: "
                "%s (saved) != %s (current)", saved[:8], cur[:8])
    else:
        with open(path, "w") as f:
            f.write(cur)


def get_logger(model_dir: str, filename: str = "train.log") -> logging.Logger:
    """File logger under the run directory (utils.py:222-236)."""
    lg = logging.getLogger(os.path.basename(os.path.abspath(model_dir)))
    lg.setLevel(logging.DEBUG)
    os.makedirs(model_dir, exist_ok=True)
    path = os.path.join(model_dir, filename)
    if not any(
        isinstance(h, logging.FileHandler)
        and getattr(h, "baseFilename", None) == os.path.abspath(path)
        for h in lg.handlers
    ):
        h = logging.FileHandler(path)
        h.setLevel(logging.DEBUG)
        h.setFormatter(logging.Formatter(
            "%(asctime)s\t%(name)s\t%(levelname)s\t%(message)s"))
        lg.addHandler(h)
    return lg
