"""JAX runtime init helpers: persistent compilation cache.

The sparse U-Net + window-attention programs are large; first compiles take
minutes. The persistent cache makes every subsequent process start warm
(keyed by HLO hash, so code changes invalidate naturally).
"""

from __future__ import annotations

import os


def setup_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "U2MKD_JAX_CACHE", os.path.expanduser("~/.cache/u2mkd_jax")
    )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
