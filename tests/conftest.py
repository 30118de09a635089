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
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

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
