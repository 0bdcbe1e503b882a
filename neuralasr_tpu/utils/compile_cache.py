"""Persistent XLA compilation cache for the CLI entry points.

Remote/TPU compiles of the scan-heavy programs (BiLSTM train steps, the
beam-search decoder) take minutes; the cache makes every run after the first
start in seconds.  Opt-out with NEURALASR_NO_COMPILE_CACHE=1; override the
location with NEURALASR_COMPILE_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(default_dir: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a repo-local directory.

    Returns the cache dir, or None if disabled (env opt-out or an old JAX
    without the config knob — failure is never fatal).
    """
    if os.environ.get("NEURALASR_NO_COMPILE_CACHE"):
        return None
    cache_dir = os.environ.get("NEURALASR_COMPILE_CACHE_DIR") or (
        default_dir
        or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        )
    )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything that takes >2s to compile; tiny programs are not
        # worth the disk round-trip.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        return None
    return cache_dir
