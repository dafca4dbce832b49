"""Persistent XLA compile-cache wiring (CLAUDE.md: .jax_cache/, keep it).

On the tunneled TPU backend first compiles are minutes; the persistent
cache makes every repeat fast. It is deliberately NOT enabled for CPU
backends: XLA:CPU AOT entries embed pseudo machine-features the loader
rejects with E-log spam on reload, and concurrent readers (pytest
subprocess + a driver run) can crash on a partially written entry
(__graft_entry__.py keeps it off for the same reason).
"""

from __future__ import annotations

import os

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def enable_persistent_cache(cache_dir: str | None = None) -> bool:
    """Enable the on-disk compile cache if the backend is a TPU.

    Safe to call after backend init (cache config is not backend-locked).
    Returns True if enabled.
    """
    import jax

    if jax.default_backend() == "cpu":
        return False
    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.path.join(_REPO_ROOT, ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return True
