"""Test configuration: run everything on a simulated 8-device CPU mesh so
sharding/collective tests work without TPU hardware (SURVEY.md §4).

A pytest plugin in this environment imports jax before conftest runs, so
setting JAX_PLATFORMS via os.environ is too late; jax.config.update works as
long as no backend has been initialised yet.
"""

import os
import tempfile

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Isolate any persistent jit cache a test enables in-process (parity_gate):
# concurrent pytest runs sharing /tmp/unimedvl_tpu_jit_cache corrupted
# entries, and jax SEGFAULTS deserializing a corrupt executable.
os.environ.setdefault(
    "UNIMEDVL_JIT_CACHE_DIR", tempfile.mkdtemp(prefix="unimedvl-test-jit-")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
