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

    Default dir overridable via ``UNIMEDVL_JIT_CACHE_DIR``; an EMPTY value
    disables persistence entirely. Test runs must disable it
    (tests/conftest.py does): enabling the on-disk cache mid-suite (the
    in-process parity_gate test) made later compiles serialize/deserialize
    executables and jax segfaulted in both paths; it also risks concurrent-
    writer corruption across processes. The cache's purpose is the real-TPU
    tunnel compiles, where it stays on."""
    import os

    import jax

    if path is None:
        path = os.environ.get(
            "UNIMEDVL_JIT_CACHE_DIR", "/tmp/unimedvl_tpu_jit_cache"
        )
    if not path:
        return
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
