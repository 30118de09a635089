"""Test configuration: CPU backend with a virtual 8-device mesh + fp64.

Must run before jax is imported anywhere: forces the CPU platform (tests are
hermetic, no TPU needed), exposes 8 virtual devices for sharding tests (the
TPU-native analog of multi-node testing without a cluster — SURVEY.md §4f),
and enables x64 so the LDLQ ≡ OPTQ equivalence test has the float64 numerics
the reference needed (gptq.py:25-27).
"""
import os

# hard override: the ambient environment may pin JAX_PLATFORMS to a TPU
# tunnel ('axon') via sitecustomize; tests must be hermetic on CPU. The env
# var alone is not enough once the plugin is registered, so also force the
# platform through jax.config below.
os.environ["JAX_PLATFORMS"] = "cpu"
# clamp OpenMP/MKL threading: torch-based oracle tests (hf_import,
# reference_parity) share the process with XLA's own compiler thread pool;
# unbounded MKL thread churn alongside it is a segfault suspect on this
# jaxlib (nondeterministic crashes deep into long suite runs)
os.environ.setdefault("OMP_NUM_THREADS", "1")
# isolate the persistent XLA compile cache: CLI tests enable it in-process,
# and sharing ~/.cache/quip_tpu/xla with concurrent TPU runs corrupted an
# entry once (segfault in jax's cache reader mid-suite)
os.environ.setdefault(
    "QUIP_TPU_COMPILE_CACHE",
    os.path.join(os.environ.get("TMPDIR", "/tmp"),
                 f"quip_tpu_test_xla_cache_{os.getpid()}"))
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# hard-disable the persistent compilation cache in the test process: jax's
# cache WRITER (compilation_cache.put_executable_and_time -> zstd) segfaults
# on some large CPU executables this suite produces (observed twice on the
# spec-decode programs once a CLI test had enabled the cache in-process).
# CLI tests keep exercising the --no_compile_cache/enable_compile_cache
# plumbing; the cache itself is exercised by the real TPU runs.
jax.config.update("jax_enable_compilation_cache", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_psd_hessian(rng, d, nsamples=None, dtype=np.float64):
    """Random PSD proxy Hessian H = XᵀX/n + small ridge, like the reference
    equivalence fixture (optq_ldlq_equiv.py:9-13)."""
    n = nsamples or 4 * d
    X = rng.standard_normal((n, d)).astype(dtype)
    H = X.T @ X / n
    H += 0.01 * np.eye(d, dtype=dtype)
    return H


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled programs between test modules: a single suite process
    otherwise accumulates hundreds of CPU executables, and XLA's compiler
    was observed to segfault nondeterministically deep into long runs.
    Tiny-shape recompiles are cheap; bounded memory is worth it."""
    yield
    jax.clear_caches()
