"""Persistent XLA compilation cache.

The flagship 7B train step compiles in 260-556 s and the serving
programs in 20-120 s (BASELINE.md round-3 ladder); the reference never
pays this (torch eager), so re-compiling on every process start is a
pure TPU-side regression for short jobs, restarts-from-checkpoint, and
SLURM retry loops. JAX ships a persistent on-disk cache keyed by the
(program, compiler version, topology) fingerprint — this module is the
one place that turns it on, so every entry point (run.py, launch.py,
benches) shares one cache directory and one policy.

Opt-out, not opt-in: caching compiled programs is free except for disk
(entries are a few MB each, keyed content-addressed, safe to share
between concurrent processes — JAX uses atomic renames). Disable with
``MSR3D_COMPILE_CACHE=0`` or ``compile_cache: false`` in the YAML.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Union

_ENV_TOGGLE = "MSR3D_COMPILE_CACHE"
_ENV_DIR = "MSR3D_COMPILE_CACHE_DIR"
_enabled_dir: Optional[str] = None


def default_cache_dir() -> str:
    return os.environ.get(_ENV_DIR) or str(
        Path.home() / ".cache" / "msr3d_tpu" / "xla_cache"
    )


def enable_compile_cache(
    path: Union[str, Path, None] = None,
    *,
    min_compile_secs: float = 1.0,
) -> Optional[str]:
    """Point JAX's persistent compilation cache at ``path`` (default:
    ``$MSR3D_COMPILE_CACHE_DIR`` or ``~/.cache/msr3d_tpu/xla_cache``).

    Returns the cache dir, or None when disabled via
    ``MSR3D_COMPILE_CACHE=0``. Idempotent; safe to call from every entry
    point. Programs compiling faster than ``min_compile_secs`` are not
    cached (a tiny-program cache write costs more than the recompile).
    """
    global _enabled_dir
    if os.environ.get(_ENV_TOGGLE, "1").lower() in ("0", "false", "off"):
        return None
    cache_dir = str(path or default_cache_dir())
    if _enabled_dir == cache_dir:
        return cache_dir

    import jax

    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs", float(min_compile_secs)
    )
    # cache even small entries: the serving path compiles many mid-size
    # programs (prefill buckets, insert, decode chunks) whose combined
    # recompile time dominates engine start-up
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    _enabled_dir = cache_dir
    return cache_dir
