"""Persistent XLA compilation cache.

The reference pays its model-load cost once per ``os.system`` invocation
(``fusion_generation/fusion_sampling.py:533-589`` is a one-shot script); the
TPU rebuild's equivalent cold-start cost is XLA compilation, which on this
backend goes through a remote compile service and takes minutes for the big
trajectory graphs. ``jax_compilation_cache_dir`` persists compiled
executables keyed by HLO hash, so every CLI start, serve first-request, and
repeat benchmark run after the first skips the remote compile entirely
(measured on the tunneled v5e: a 30-op jit goes 1.45 s cold -> 0.06 s warm;
the 50-step fusion trajectory drops from minutes to seconds).

Enabled by default in every CLI entry point and ``bench.py``. Controls:

* ``TWEEDIEMIX_COMPILE_CACHE`` — cache directory (default
  ``<repo>/.jax_cache``); set to ``0``/``off``/empty to disable, or
  ``1``/``on`` to force-enable with the default dir on any backend.

The default-on path applies only when the backend is TPU: TPU executables
are chip-targeted and host-independent, but XLA:CPU caches AOT machine
code for the *compile* host's microarchitecture — in this environment CPU
compiles can go through the remote compile service, so a cached CPU
executable may not match the execution host (cpu_aot_loader warns it
"could lead to execution errors such as SIGILL"). Passing an explicit
``cache_dir`` or setting the env var opts in regardless of backend.
"""

from __future__ import annotations

import os


def default_cache_dir() -> str:
    # repo-local so it never touches anything outside the checkout; the
    # directory is gitignored (compiled binaries, machine-specific)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(repo, ".jax_cache")


def enable_compile_cache(cache_dir: str | None = None) -> str | None:
    """Point JAX at a persistent on-disk compilation cache. Idempotent;
    returns the cache dir in use, or None when disabled via env / gated off
    (default-on is TPU-only, see module docstring). Call after ``import
    jax`` but before the first ``jit`` compilation. NOTE: the TPU gate
    initializes the backend — under ``--multihost`` call this only after
    ``jax.distributed.initialize``."""
    env = os.environ.get("TWEEDIEMIX_COMPILE_CACHE")
    if env is not None and env.lower() in ("", "0", "off", "none", "false"):
        return None
    if env is not None and env.lower() in ("1", "on", "true", "yes"):
        # boolean-style enable (symmetric with the repo's other 0/1 knobs):
        # use the default dir and force-opt-in regardless of backend
        env = default_cache_dir()
    import jax

    path = cache_dir or env
    if path is None:
        if jax.default_backend() != "tpu":
            return None
        path = default_cache_dir()
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache everything that takes noticeable compile time; the remote
    # compile service makes even small graphs cost ~1 s
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
