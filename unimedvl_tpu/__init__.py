"""unimedvl_tpu — a TPU-native (JAX/XLA/Pallas) unified medical vision-language
framework with the capabilities of UniMedVL (BAGEL-style Mixture-of-Transformers:
text understanding/generation + rectified-flow image generation in one backbone).

Design stance (not a port of the PyTorch reference):
  * batched padded sequences + segment masks instead of CUDA varlen packing
  * static-shape, append-only KV cache pytree with cheap functional forks (CFG)
  * one jitted program per phase: prefill / decode_step / denoise_step
  * MoT experts as stacked parameter pytrees scanned over layers
  * sharding via jax.sharding.Mesh + NamedSharding (TP over ICI)
"""

__version__ = "0.1.0"


def enable_compilation_cache(path: str = None) -> None:
    """Enable JAX's persistent compilation cache (first TPU compiles of the
    big programs take minutes; subsequent processes reload in seconds).

    Default dir overridable via ``UNIMEDVL_JIT_CACHE_DIR`` — test runs MUST
    isolate their cache (tests/conftest.py does): two processes writing one
    dir concurrently can corrupt entries, and jax segfaults deserializing a
    corrupt executable."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "UNIMEDVL_JIT_CACHE_DIR", "/tmp/unimedvl_tpu_jit_cache"
        )
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


from unimedvl_tpu.config import (
    LLMConfig,
    ViTConfig,
    VAEConfig,
    BagelConfig,
    GenerationConfig,
)

__all__ = [
    "LLMConfig",
    "ViTConfig",
    "VAEConfig",
    "BagelConfig",
    "GenerationConfig",
    "__version__",
]
