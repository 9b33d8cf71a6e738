"""Graceful preemption: SIGTERM / request_stop() / --time-limit checkpoint
and exit cleanly at a step boundary.

The reference has NO preemption story (SURVEY §5.3): a SIGTERM kills the
Lightning process and loses everything since the last periodic checkpoint
(every 2000 steps, /root/reference/train.py:88). Here a TPU maintenance
event or scheduler SIGTERM costs at most one step.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

from vcvits_tpu.config import Config
from vcvits_tpu.utils.audio_io import write_wav

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# mirrors tests/test_trainer.py's tiny setup (module-scoped there; this file
# runs in a subprocess so it carries its own copy)
CHILD = """
import logging, sys
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(message)s", force=True)
import jax.numpy as jnp
from vcvits_tpu.config import load_config
from vcvits_tpu.models.hubert import HubertConfig
from vcvits_tpu.train.trainer import Trainer

cfg = load_config(sys.argv[1])
tiny_hubert = HubertConfig(
    conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),
    hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
    pos_conv_kernel=8, pos_conv_groups=2,
)
trainer = Trainer(cfg, workdir=sys.argv[2], hubert_cfg=tiny_hubert)
state = trainer.fit(max_steps=10_000)
print("FIT_RETURNED", flush=True)
"""


def _make_corpus(tmp):
    sr = 48000
    g = np.random.default_rng(7)
    lines = []
    for sid in range(2):
        for i in range(2):
            t = np.arange(int(sr * 0.45)) / sr
            y = 0.3 * np.sin(2 * np.pi * (160 + 60 * sid) * t) \
                + 0.02 * g.standard_normal(len(t))
            p = tmp / f"s{sid}_{i}.wav"
            write_wav(str(p), y.astype(np.float32), sr)
            lines.append(f"{p}|{sid}")
    fl = tmp / "train.txt"
    fl.write_text("\n".join(lines) + "\n")
    return str(fl)


def _tiny_cfg(tmp, fl) -> Config:
    return Config.from_dict({
        "train": {"segment_size": 2048, "batch_size": 2, "steps_per_epoch": 10, "disc_time_fold": False,
                  "log_interval": 1, "eval_interval": 100000,
                  "checkpoint_interval": 100000, "fp16_run": False},
        "data": {"filter_length": 1024, "win_length": 1024, "hop_length": 512,
                 "n_mel_channels": 8, "n_speakers": 4,
                 "training_files": fl, "validation_files": "",
                 "length_buckets": [0.5], "cache_dir": str(tmp / "cache")},
        "model": {
            "inter_channels": 8, "hidden_channels": 16, "filter_channels": 32,
            "n_heads": 2, "n_layers": 1, "kernel_size": 3, "p_dropout": 0.1,
            "hubert_channels": 16, "num_pitch": 64, "gin_channels": 4,
            "upsample_initial_channel": 32,
            "resblock_kernel_sizes": [3], "resblock_dilation_sizes": [[1, 3]],
            "multi_period_discriminator_periods": [2, 3],
        },
    })


@pytest.mark.slow
def test_sigterm_checkpoints_and_exits_cleanly(tmp_path):
    import json

    fl = _make_corpus(tmp_path)
    cfg = _tiny_cfg(tmp_path, fl)
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(cfg.to_dict()))
    workdir = tmp_path / "logs"

    env = {**os.environ, "JAX_PLATFORMS": "cpu", "PYTHONPATH": ROOT}
    proc = subprocess.Popen(
        [sys.executable, "-c", CHILD, str(cfg_path), str(workdir)],
        cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True,
    )
    try:
        # wait until at least 2 steps have logged (log_interval=1), then TERM
        deadline = time.monotonic() + 600
        seen = 0
        for line in proc.stderr:
            if "loss_g=" in line:
                seen += 1
                if seen >= 2:
                    break
            if time.monotonic() > deadline:
                raise TimeoutError("child never reached step 2")
        proc.send_signal(signal.SIGTERM)
        out, err = proc.communicate(timeout=300)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()

    assert proc.returncode == 0, err[-2000:]
    assert "FIT_RETURNED" in out
    assert "graceful stop" in err

    from vcvits_tpu.train.checkpoint import CheckpointManager

    ckpt = CheckpointManager(str(workdir / "checkpoints"))
    step = ckpt.latest_step()
    assert step is not None and step >= 2, step


@pytest.mark.slow
def test_request_stop_and_time_limit(tmp_path):
    """Programmatic stop + max_seconds both land a final checkpoint."""
    from vcvits_tpu.models.hubert import HubertConfig
    from vcvits_tpu.train.checkpoint import CheckpointManager
    from vcvits_tpu.train.trainer import Trainer

    fl = _make_corpus(tmp_path)
    cfg = _tiny_cfg(tmp_path, fl)
    tiny_hubert = HubertConfig(
        conv_layers=((16, 10, 5), (16, 8, 8), (16, 8, 8)),
        hidden_size=16, num_layers=1, num_heads=2, intermediate_size=32,
        pos_conv_kernel=8, pos_conv_groups=2,
    )

    # request_stop before fit: the loop must stop at the FIRST boundary
    # (after state init, before any step) and still return a saved state
    w1 = str(tmp_path / "logs1")
    tr = Trainer(cfg, workdir=w1, hubert_cfg=tiny_hubert)
    tr.request_stop("unit-test")
    state = tr.fit(max_steps=50)
    assert state is not None
    assert CheckpointManager(os.path.join(w1, "checkpoints")).latest_step() == 0

    # max_seconds=0 exactly: deadline already passed -> stop at the first
    # boundary (regression: a falsy check once disabled the limit for 0.0)
    w2 = str(tmp_path / "logs2")
    tr2 = Trainer(cfg, workdir=w2, hubert_cfg=tiny_hubert)
    state2 = tr2.fit(max_steps=50, max_seconds=0.0)
    assert state2 is not None
    assert CheckpointManager(os.path.join(w2, "checkpoints")).latest_step() == 0
