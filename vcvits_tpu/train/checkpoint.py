"""Orbax checkpoint/resume with shape-tolerant restore.

Capability parity with the reference's Lightning ModelCheckpoint
(save_last, every_n_train_steps=2000 — /root/reference/train.py:88,
auto-resume :112-113) and the shape-tolerant partial load of
vcvits.py:265-282 (mismatched tensors fall back to the fresh init and the
optimizer state is discarded — the reference's fine-tune-across-config-
changes feature). TPU redesign: async Orbax saves (device-to-host copy
overlaps training), atomic step directories, latest-step discovery.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from vcvits_tpu.train.state import GANTrainState

logger = logging.getLogger(__name__)


def _manager(directory: str, max_to_keep: int = 3) -> ocp.CheckpointManager:
    return ocp.CheckpointManager(
        os.path.abspath(directory),
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True, enable_async_checkpointing=True
        ),
    )


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        self._mgr = _manager(directory, max_to_keep)

    def save(self, step: int, state: GANTrainState) -> None:
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def restore(self, template: GANTrainState, step: Optional[int] = None) -> GANTrainState:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return self._mgr.restore(step, args=ocp.args.StandardRestore(template))

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore as a pytree of host numpy arrays, ignoring the device
        shardings Orbax recorded at save time.

        A plain ``restore(step)`` replays the saved shardings, so a
        checkpoint written in a CPU process fails to load on TPU (and vice
        versa) with "Device TFRT_CPU_0 was not found". Numpy leaves are
        topology-agnostic; callers re-shard (``shard_replicated`` /
        ``device_put``) as needed.
        """
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        return restore_raw_arrays(os.path.join(self.directory, str(step)))

    def restore_tolerant(
        self, template: GANTrainState, step: Optional[int] = None
    ) -> Tuple[GANTrainState, bool]:
        """Restore, substituting any shape-mismatched/missing leaf with the
        template's fresh value; if anything changed, reset optimizer state
        (vcvits.py:265-282 semantics). Returns (state, changed)."""
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        raw = self.restore_raw(step)  # unvalidated pytree of host arrays

        changed = [False]

        def merge(tmpl_tree, raw_tree, label):
            flat_t = _flatten(tmpl_tree)
            flat_r = _flatten(raw_tree) if raw_tree is not None else {}
            out = {}
            for k, tv in flat_t.items():
                rv = flat_r.get(k)
                if rv is None:
                    logger.info("ckpt[%s]: missing %s — keeping fresh init", label, k)
                    changed[0] = True
                    out[k] = tv
                elif tuple(np.shape(rv)) != tuple(np.shape(tv)):
                    logger.info(
                        "ckpt[%s]: shape mismatch %s (%s vs %s) — keeping fresh init",
                        label, k, np.shape(rv), np.shape(tv),
                    )
                    changed[0] = True
                    out[k] = tv
                else:
                    out[k] = np.asarray(rv).astype(np.asarray(tv).dtype)
            for k in flat_r:
                if k not in flat_t:
                    logger.info("ckpt[%s]: dropping %s", label, k)
                    changed[0] = True
            return _unflatten(out)

        g_params = merge(template.g_params, raw.get("g_params"), "g")
        d_params = merge(template.d_params, raw.get("d_params"), "d")
        if changed[0]:
            state = GANTrainState(
                step=template.step, g_params=g_params, g_opt_state=template.g_opt_state,
                d_params=d_params, d_opt_state=template.d_opt_state,
            )
        else:
            state = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return state, changed[0]


def restore_raw_arrays(step_dir: str, item: str = "default") -> Any:
    """Load one Orbax step directory as numpy, sharding-agnostically."""
    path = os.path.join(step_dir, item)
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    meta = getattr(meta, "item_metadata", meta)  # StepMetadata (orbax >=0.11)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
    return ckptr.restore(path, restore_args=restore_args)


def _flatten(tree, prefix=()) -> dict:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def _unflatten(flat: dict):
    root: dict = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root
