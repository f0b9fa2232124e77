"""Repo-local persistent JAX compilation cache, gated to non-CPU backends.

The fused SoA graphs compile slowly (cold TPU compile ~10 min at a
given batch shape — ``results/compile_time.json``), so every TPU
script points JAX at the repo-local ``.jax_cache``. The cache must
NEVER be enabled for the CPU backend in this image: XLA:CPU AOT
deserialization is not roundtrip-safe and can SEGFAULT on reload (and
cache entries written on one host's vector ISA warn/fail on another —
observed ``cpu_aot_loader.cc`` machine-feature mismatches). Scripts
therefore call :func:`enable_compilation_cache` instead of setting
``jax_compilation_cache_dir`` themselves.
"""

import os

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def enable_compilation_cache(cache_dir: str = "") -> bool:
    """Points JAX at the persistent compilation cache — non-CPU only.

    Returns ``True`` iff the cache was enabled. Calling this
    initializes the JAX backend (it must inspect
    ``jax.default_backend()``), which on this image claims the
    single-process TPU lease — call it where the script would claim
    the device anyway.
    """
    import jax

    if jax.default_backend() == "cpu":
        return False
    jax.config.update(
        "jax_compilation_cache_dir",
        cache_dir or os.path.join(_REPO, ".jax_cache"))
    return True
