"""Persistent XLA compile cache for the CLI entry points.

First compiles on the tunneled TPU cost 20-40 s (the decode scan:
minutes) and were paid per PROCESS — every `cli.generate` invocation
recompiled the same programs. XLA's persistent compilation cache is
content-hash keyed (program + compiler flags + platform), so enabling
it makes the second process onward hit disk instead of the compiler.

The test suite already does this (tests/conftest.py); this helper is
the same configuration for production runs. Opt out with
MG_NO_COMPILE_CACHE=1 (e.g. when bisecting compiler issues).

Known failure mode (was documented in CLAUDE.md): jax's on-disk LRU
cache writes entries with a bare `Path.write_bytes` — NOT atomic — so
a process killed mid-write leaves a truncated entry that HANGS later
readers in get_executable_and_time (deserializing a cut-off
executable). `_patch_atomic_cache_writes` fixes the class: entry
writes go to a same-directory temp file and `os.replace` into place
(atomic on POSIX), so killed runs can no longer poison the cache.
The reference has no compile cache because torch eager has no compile
step (SURVEY.md §1 — its startup cost is model construction, not
compilation).
"""

from __future__ import annotations

import os
import tempfile

_PATCHED = False


def _patch_atomic_cache_writes() -> None:
    """Replace jax's LRUCache.put entry write with tmp-file +
    os.replace. Monkeypatch of a jax internal (jax._src.lru_cache) —
    version-guarded: if the internals moved, leave jax's own put in
    place (correct, just not kill-safe)."""
    global _PATCHED
    if _PATCHED:
        return
    try:
        from jax._src import lru_cache as _lru

        orig_put = _lru.LRUCache.put

        def atomic_put(self, key, val):
            # eviction mode (a max cache size is configured) adds
            # locking + atime bookkeeping — delegate wholesale; we
            # never configure it
            if getattr(self, "eviction_enabled", False):
                return orig_put(self, key, val)
            try:
                path = getattr(self, "path", None)
                if path is None or not key:
                    return orig_put(self, key, val)
                cache_path = path / f"{key}{_lru._CACHE_SUFFIX}"
                if cache_path.exists():
                    return None
                fd, tmp = tempfile.mkstemp(dir=str(path),
                                           suffix=".tmp")
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(val)
                    os.replace(tmp, cache_path)
                except BaseException:
                    try:
                        os.unlink(tmp)
                    except OSError:
                        pass
                    raise
                return None
            except Exception:  # noqa: BLE001 — cache is best-effort
                return orig_put(self, key, val)

        _lru.LRUCache.put = atomic_put
        _PATCHED = True
    except Exception:  # noqa: BLE001 — jax internals moved; skip
        pass


def enable_persistent_compile_cache() -> str | None:
    """Point jax at the shared on-disk compile cache; returns the dir
    (None when disabled). Call BEFORE the first jit dispatch — entries
    compiled earlier in the process are not back-filled."""
    if os.environ.get("MG_NO_COMPILE_CACHE") == "1":
        return None
    import jax

    _patch_atomic_cache_writes()
    cache = os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/musicgeneration_tpu/jax_cache"))
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    return cache
