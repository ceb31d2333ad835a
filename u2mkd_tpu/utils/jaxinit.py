"""JAX runtime init helpers: persistent compilation cache.

The sparse U-Net + window-attention programs are large; first compiles take
minutes. The persistent cache makes every subsequent process start warm
(keyed by HLO hash, so code changes invalidate naturally).
"""

from __future__ import annotations

import os


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature set.

    XLA:CPU persists AOT results compiled for the *build* machine's exact
    features; loading them on a host with fewer features risks SIGILL (the
    loader only warns). Sandboxes migrate between machines, so the cache
    dir is keyed by the CPU flags — a different machine simply starts a
    fresh subdirectory instead of cross-loading."""
    try:
        import hashlib
        import re

        with open("/proc/cpuinfo") as f:
            txt = f.read()
        flags = sorted(set(re.findall(r"^flags\s*:\s*(.*)$", txt, re.M)))
        return hashlib.sha1(" ".join(flags).encode()).hexdigest()[:8]
    except Exception:
        return "generic"


def setup_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get("U2MKD_JAX_CACHE")
    if path is None:
        path = os.path.join(
            os.path.expanduser("~/.cache/u2mkd_jax"), _machine_tag()
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization only
