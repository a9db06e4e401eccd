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


def persistent_cache_dir(sub: str = "") -> str:
    """A cache directory that SURVIVES sessions.

    /tmp is wiped between sessions on this host (observed 2026-08-18), which
    made every new session pay a ~100+ s cold jit compile and minutes of CPU
    oracle regeneration. $HOME does persist (git history / memory dirs prove
    it), so the default cache home is ~/.cache/sfft_tpu, overridable with
    SFFT_TPU_CACHE_DIR. Falls back to /tmp only if the home is unwritable.
    """
    base = os.environ.get("SFFT_TPU_CACHE_DIR")
    if not base:
        base = os.path.join(os.path.expanduser("~"), ".cache", "sfft_tpu")
    path = os.path.join(base, sub) if sub else base
    try:
        os.makedirs(path, exist_ok=True)
        probe = os.path.join(path, ".probe")
        with open(probe, "w") as f:
            f.write("ok")
        os.remove(probe)
    except OSError:
        path = os.path.join("/tmp", "sfft_tpu_cache", sub)
        os.makedirs(path, exist_ok=True)
    return path


def setup_compile_cache(base: str | None = None) -> str:
    """Point jax's persistent compilation cache at a backend-version-keyed
    subdirectory of `base`. Call after `import jax` (and after any
    jax.config platform selection), before the first compile."""
    import jax

    if base is None:
        base = persistent_cache_dir("jit_cache")

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
