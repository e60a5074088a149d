"""RMSNorm (reference: invokeRootMeanSquareNorm / fused add-residual RMSNorm,
src/turbomind/models/llama/llama_decoder_kernels.cu).

On TPU these are pure XLA ops — the compiler fuses the residual add,
reduction and scale into the surrounding computation, so no Pallas kernel
is needed (HBM-bound elementwise work fuses into the adjacent matmuls).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """y = x / rms(x) * weight, computed in fp32 like the reference kernel."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps)
    return (y * weight.astype(jnp.float32)).astype(dtype)


def add_residual_rms_norm(x: jnp.ndarray, residual: jnp.ndarray,
                          weight: jnp.ndarray, eps: float = 1e-6):
    """Fused residual-add + RMSNorm: returns (normed, new_residual).

    Mirrors the reference's invokeFusedAddBiasResidualRMSNorm which both
    accumulates the residual stream and produces the normed input of the
    next block (llama_decoder_kernels.cu).
    """
    new_residual = (residual.astype(jnp.float32)
                    + x.astype(jnp.float32)).astype(x.dtype)
    return rms_norm(new_residual, weight, eps), new_residual
