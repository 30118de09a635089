"""Shared small utilities."""
import os
import zlib


def enable_compile_cache(path: str | None = None) -> str:
    """Turn on JAX's persistent compilation cache (verified working through
    the axon TPU relay: a cached program loads in <0.5 s vs 20-40 s of
    fresh XLA compile — the dominant cost of a quantization run is the
    per-shape solver/model compiles, so re-runs become solve-bound).

    All CLIs enable this by default (--no_compile_cache opts out); library
    users call it explicitly.

    No-op on the CPU backend: CPU compiles are fast, and this jax build's
    cache WRITER (compilation_cache.put_executable_and_time) was observed
    to segfault serializing some large CPU executables (speculative-decode
    programs). The cache's entire value is on the TPU path."""
    import jax

    if jax.default_backend() == "cpu":
        return ""

    # QUIP_TPU_COMPILE_CACHE overrides the default location; the test
    # suite points it at a per-session temp dir so hermetic CPU tests
    # never share (or race) the real cache with concurrent TPU runs — a
    # corrupted shared entry segfaulted jax's cache reader once.
    path = (path or os.environ.get("QUIP_TPU_COMPILE_CACHE")
            or os.path.expanduser("~/.cache/quip_tpu/xla"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # default thresholds skip sub-second programs; we want everything that
    # took a real compile
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path


def name_salt(name: str) -> int:
    """Deterministic 31-bit salt for deriving per-layer PRNG keys from
    names. Python's built-in hash() is randomized per process
    (PYTHONHASHSEED), which would make quantization non-reproducible
    across runs; crc32 is stable everywhere."""
    return zlib.crc32(name.encode("utf-8")) & 0x7FFFFFFF
