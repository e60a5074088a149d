"""lmdeploy_tpu — a TPU-native LLM inference & serving framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of
LMDeploy v0.0.9 (TurboMind engine + serving stack), built TPU-first:

- SPMD tensor parallelism over a ``jax.sharding.Mesh`` (ICI collectives)
  instead of NCCL threads (reference: src/turbomind/utils/nccl_utils.h).
- A paged, sharded KV cache with a host-side page table instead of
  per-sequence CUDA slabs (reference: LlamaCacheManager.cc).
- Pallas kernels for decode attention, prefill flash attention and
  W4A16 grouped-dequant matmul (reference: decoder_masked_multihead_attention,
  flash_attention2, gemm_s_f16).
- A persistent (continuous) batch scheduler driving fixed-shape compiled
  step functions (reference: LlamaBatch.cc).
"""
from .version import __version__, version_info  # noqa: F401

__all__ = ['__version__', 'version_info', 'build_engine', 'AsyncEngine',
           'GenerationConfig', 'EngineConfig', 'ModelConfig']


def __getattr__(name):  # lazy: importing the package must not pull jax
    if name == 'build_engine':
        from .api import build_engine
        return build_engine
    if name == 'AsyncEngine':
        from .serve.async_engine import AsyncEngine
        return AsyncEngine
    if name == 'GenerationConfig':
        from .messages import GenerationConfig
        return GenerationConfig
    if name in ('EngineConfig', 'ModelConfig'):
        from . import config
        return getattr(config, name)
    raise AttributeError(name)
