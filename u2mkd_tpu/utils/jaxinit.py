"""JAX runtime init helpers: persistent compilation cache.

The sparse U-Net + window-attention programs are large; first compiles take
minutes. The persistent cache makes every subsequent process start warm
(keyed by HLO hash, so code changes invalidate naturally).
"""

from __future__ import annotations

import os


def _machine_tag() -> str:
    """Fingerprint of the host CPU's feature set + the jax version.

    XLA:CPU persists AOT results compiled for the *build* machine's exact
    features; loading them on a host with fewer features risks SIGILL (the
    loader only warns). Sandboxes migrate between machines, so the cache
    dir is keyed by the CPU flags — a different machine simply starts a
    fresh subdirectory instead of cross-loading. Round 4 showed a
    feature-mismatched artifact cross-loading anyway (identical
    /proc/cpuinfo flag hash, different XLA/LLVM target features — e.g.
    version-dependent tuning features like ``+prefer-no-scatter``), so the
    tag now also carries the jax version, and callers that cap codegen ISA
    (``cpu_portable_codegen``) get a portable tag instead."""
    try:
        import hashlib
        import re

        import jax

        isa = _isa_cap_from_flags()
        if isa:
            return f"portable-{isa.lower()}-jax{jax.__version__}"
        with open("/proc/cpuinfo") as f:
            txt = f.read()
        flags = sorted(set(re.findall(r"^flags\s*:\s*(.*)$", txt, re.M)))
        h = hashlib.sha1(" ".join(flags).encode()).hexdigest()[:8]
        return f"{h}-jax{jax.__version__}"
    except Exception:
        return "generic"


def _isa_cap_from_flags() -> str | None:
    import re

    m = re.search(r"--xla_cpu_max_isa=(\w+)", os.environ.get("XLA_FLAGS", ""))
    return m.group(1) if m else None


def cpu_portable_codegen(isa: str = "AVX2") -> None:
    """Cap XLA:CPU codegen at a baseline ISA so persisted compile-cache
    artifacts are portable across sandbox hosts (no SIGILL-risk
    cross-loads, no feature-mismatch warnings). Must run BEFORE any jax
    backend initializes. The matching cache tag comes from
    ``_machine_tag`` seeing the flag in XLA_FLAGS."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "--xla_cpu_max_isa" not in flags:
        os.environ["XLA_FLAGS"] = (flags + f" --xla_cpu_max_isa={isa}").strip()


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
