"""Persistent XLA compilation cache that actually engages in this runtime.

Every CLI here used to set ``JAX_COMPILATION_CACHE_DIR`` via
``os.environ.setdefault`` before ``import jax``. That is the documented
mechanism, but in the axon TPU environment the interpreter STARTS with all
of jax pre-imported (a startup hook pulls in ``jax`` before any user code
runs), so ``jax._src.config`` has already frozen its defaults and the env
var is silently ignored — measured result: ``~/.cache/vcvits_tpu_xla``
stayed empty across rounds and every process paid the full remote compile
(30 s – 10+ min per program over the tunnel).

``jax.config.update`` works at any time before the first compile, so this
helper is the one reliable path. Call it first thing in every entry point.
"""

from __future__ import annotations

import os

_DEFAULT = "~/.cache/vcvits_tpu_xla"


def enable_persistent_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at ``path`` (default
    ``$JAX_COMPILATION_CACHE_DIR`` or ``~/.cache/vcvits_tpu_xla``) in a way
    that survives this environment's pre-imported jax. Idempotent; returns
    the resolved path."""
    import jax

    resolved = os.path.expanduser(
        path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT
    )
    os.makedirs(resolved, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", resolved)
    # Cache every program that takes noticeable compile time; the remote
    # tunnel makes even mid-sized programs multi-second compiles.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    # Keep the env var coherent for any subprocess this one spawns.
    os.environ["JAX_COMPILATION_CACHE_DIR"] = resolved
    return resolved
