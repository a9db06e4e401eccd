"""Persistent-compile-cache setup, keyed by the backend version.

The axon runtime revs its serialized-executable format without changing the
persistent-cache key jax computes (measured 2026-08-17: executables cached
under the previous backend build deserialize fine but every dispatch fails
with `UNIMPLEMENTED: TPU backend error` — platform_version showed
`SerializedExecutable v9; compile-cache v14` after the update). Keying the
cache DIRECTORY by a hash of `platform_version` turns a backend update into a
clean cold compile instead of a poisoned cache.
"""

from __future__ import annotations

import hashlib
import os


def setup_compile_cache(base: str = "/tmp/sfft_tpu_jit_cache") -> str:
    """Point jax's persistent compilation cache at a backend-version-keyed
    subdirectory of `base`. Call after `import jax` (and after any
    jax.config platform selection), before the first compile."""
    import jax

    try:
        from jax._src import xla_bridge

        ver = xla_bridge.get_backend().platform_version
    except Exception:
        ver = "unknown"
    tag = hashlib.sha1(ver.encode()).hexdigest()[:10]
    path = os.path.join(base, tag)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass
    return path
