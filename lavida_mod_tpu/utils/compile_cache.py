"""Persistent XLA compilation cache for the serving CLIs.

Cold-start compiles of the fused serve graphs run 5-15 minutes at the
8B geometry (one executable for vision->prefill->denoise); the
persistent cache turns every later process start into a disk read.  The
reference has no analogue (torch eager pays per-op dispatch instead of
per-process compiles); for XLA serving this is the difference between a
worker restart taking seconds and taking minutes.

jax also honors JAX_COMPILATION_CACHE_DIR natively — this helper only
supplies a default location and the sub-minute threshold, and stays
silent when the user already configured one.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "lavida_mod_tpu", "xla")


def enable(path: str | None = None,
           min_compile_secs: float = 5.0) -> str | None:
    """Point jax's persistent compilation cache at `path` (created if
    missing).  Entries below `min_compile_secs` are not persisted (tiny
    graphs churn the cache for no win).  Returns the directory used.

    No-op when the user already set JAX_COMPILATION_CACHE_DIR (their
    configuration wins).  An unwritable default location (read-only
    HOME in a serving container) degrades to running uncached — the
    cache is an optimization, never a startup-crash path; returns
    None in that case."""
    import jax

    env = os.environ.get("JAX_COMPILATION_CACHE_DIR")
    if env and path is None:
        return env
    path = path or DEFAULT_DIR
    try:
        os.makedirs(path, exist_ok=True)
    except OSError as e:
        import logging

        logging.getLogger(__name__).warning(
            "compile cache disabled (%s unwritable: %s)", path, e)
        return None
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
