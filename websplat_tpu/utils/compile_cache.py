"""Opt-in persistent XLA compilation cache for scripts and benchmarks.

TPU (Mosaic) compiles of the unrolled rasterizer run 20-60 s each through
the axon tunnel; the benchmark/sweep scripts recompile identical programs on
every invocation.  Caching the serialized executables under ``.jax_cache``
(gitignored, shared with the test suite's conftest) makes reruns near-free.

Library code never calls this — mutating global jax config belongs to
entry points, not imports.
"""

from __future__ import annotations

import os


def enable(directory: str | None = None, min_compile_secs: float = 1.0) -> None:
    """Point jax at a persistent on-disk compilation cache.

    Safe to call more than once; silently a no-op if the running jax/PJRT
    combination does not support executable serialization (jax logs a
    warning and compiles as usual).
    """
    import jax

    if directory is None:
        directory = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            ".jax_cache",
        )
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", min_compile_secs)
