"""Persistent XLA compilation cache for every CLI entry point.

The reference pays no compile cost (eager torch); this framework compiles
one XLA graph per (resolution, batch) bucket, and on remote-tunnel TPU
backends a large predict/train graph costs 1-4 MINUTES to compile (verify
notes). JAX's persistent compilation cache keys serialized executables by
HLO hash, so the second process that builds the same graph loads it in
milliseconds — across CLI invocations, bench runs, and resumed trainings.

`enable()` is called by the CLI drivers (cli/train.py, bench.py, ...)
before the first jit. It is a no-op when the backend cannot serialize
executables (JAX logs and skips — correctness is unaffected) and can be
disabled with YNT_COMPILE_CACHE=0 or redirected with
YNT_COMPILE_CACHE=/path.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser("~"), ".cache",
                            "yolo_nano_tpu", "xla")


def enable(cache_dir: str | None = None) -> str | None:
    """Turn on JAX's persistent compilation cache. Returns the cache dir,
    or None when disabled (YNT_COMPILE_CACHE=0) or when the backend is CPU
    — CPU compiles are fast and XLA:CPU's AOT loader logs spurious
    machine-feature-mismatch errors on every cache hit (measured here), so
    the cache only pays on TPU. Set YNT_COMPILE_CACHE=<dir> to force it on
    anyway (an explicit cache_dir argument forces it on the same way)."""
    env = os.environ.get("YNT_COMPILE_CACHE")
    if env == "0":
        return None

    import jax

    if jax.default_backend() == "cpu" and not (env or cache_dir):
        return None
    cache_dir = cache_dir or env or _DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache everything that takes ≥1s to compile (the default threshold
    # skips small graphs; our per-bucket graphs are all worth keeping)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return cache_dir
