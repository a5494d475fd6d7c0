"""Persistent XLA compile-cache setup.

Train-graph compiles cost minutes (the scanned comp-distill program
~17 min through the axon relay's compile helper; ~25 min for the r3-era
unrolled ones). Where the PJRT backend supports executable
serialization — measured working through the axon relay 2026-08-22,
entries up to ~330 MB for the three comp programs — a re-launched or
resumed process reloads every program instead of recompiling, which
turns a ~70-minute fresh-process resume into minutes. Harmless (a
warning, then no-op) where serialization is unsupported.

Call `enable_compile_cache()` BEFORE the first jit lowering; train.py
and the bench scripts do this at import.
"""

from __future__ import annotations

import os


def enable_compile_cache(path: str | None = None,
                         min_compile_secs: float = 10.0) -> str:
    """Point JAX's persistent compilation cache at `path` (default
    `$ADAFACE_COMPILE_CACHE` or ~/.cache/adaface_tpu_xla). → the dir."""
    import jax

    cache_dir = (path or os.environ.get("ADAFACE_COMPILE_CACHE")
                 or os.path.expanduser("~/.cache/adaface_tpu_xla"))
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return cache_dir
