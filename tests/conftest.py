"""Test configuration: run everything on a simulated 8-device CPU mesh so
sharding/collective tests work without TPU hardware (SURVEY.md §4).

A pytest plugin in this environment imports jax before conftest runs, so
setting JAX_PLATFORMS via os.environ is too late; jax.config.update works as
long as no backend has been initialised yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Disable the persistent jit cache for tests (empty value): the in-process
# parity_gate test otherwise enables it mid-suite, after which later
# compiles serialize/deserialize executables — jax segfaulted in BOTH those
# paths on the virtual-device CPU suite (and concurrent pytest runs sharing
# /tmp/unimedvl_tpu_jit_cache additionally corrupt entries). The cache
# exists for real-TPU tunnel compiles, which tests never do.
os.environ.setdefault("UNIMEDVL_JIT_CACHE_DIR", "")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")


import gc

import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_compiled_program_accumulation():
    """Clear jax's compiled-program caches between test MODULES: with the
    full suite in one process the accumulated executables eventually
    segfault XLA:CPU inside a later compile (reproducibly at the FSDP train
    step, only in the full combination — no subset triggers it). Clearing
    per module keeps each module's intra-module compile reuse while bounding
    the process-lifetime accumulation; cross-module program reuse was
    minimal (distinct tiny configs per module)."""
    yield
    import jax

    jax.clear_caches()
    gc.collect()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heaviest tests (minutes each on the 1-core host); deselect "
        "with -m 'not slow' for the fast iteration subset",
    )
