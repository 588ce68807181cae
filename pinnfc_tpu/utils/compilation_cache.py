"""Persistent XLA compilation cache.

First-time compiles through the TPU tunnel cost minutes; the staged schedule
compiles 7 distinct scan programs.  Enabling JAX's persistent cache makes
every repeat invocation (CLI rerun, bench, driver round) hit disk instead of
recompiling.  Safe to call unconditionally — failures degrade to no cache.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/pinnfc_jax") -> bool:
    """Turn on the persistent compilation cache.  Returns success.

    ``PINNFC_COMPILATION_CACHE_DIR`` overrides ``path``; the empty
    string DISABLES the cache.  The CPU-sim test harness disables it:
    XLA:CPU executable serialize/deserialize aborted the process
    (``Fatal Python error: Aborted`` inside ``executable.serialize()`` /
    ``backend.deserialize_executable``) twice late in full-suite runs,
    CPU compiles are seconds anyway, and a killed test run sharing the
    production cache can leave a truncated entry that aborts the next
    reader (all three observed live, 2026-08-17)."""
    try:
        import jax

        override = os.environ.get("PINNFC_COMPILATION_CACHE_DIR")
        if override == "":
            return False
        cache_dir = os.path.expanduser(override if override else path)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        return True
    except Exception:
        return False
