"""Linear layers: bf16 dense and W4A16 grouped-quantized dense.

TPU-native replacement for the reference's LlamaLinear dispatch
(src/turbomind/models/llama/LlamaLinear.h:29-81: fp16 -> cublas,
kINT4 -> GemmS4F16 fused dequant GEMM).  Here:

- bf16/fp32 weights -> ``jnp.dot`` (XLA drives the MXU directly).
- int4 weights -> a Pallas grouped-dequant matmul kernel
  (ops/pallas/quant_matmul.py) with an XLA dequant+dot fallback.

Packed int4 format ("nibble-split-K"): a [K, N] uint4 weight is stored as
uint8 [K//2, N] where byte row r packs original rows r (low nibble) and
r + K//2 (high nibble).  Both nibble planes then correspond to *contiguous*
halves of the activation's K axis, so the kernel computes
``A[:, :K/2] @ deq(lo) + A[:, K/2:] @ deq(hi)`` with no strided loads.
Dequant is AWQ-style asymmetric: w = (q - z) * s with per-(group, N)
scale/zero, group along K (reference group_size=128, gemm_s4_f16.cu:243).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantizedWeight:
    """W4A16 weight: logical [K, N] uint4 + per-group asymmetric qparams."""
    packed: jnp.ndarray   # uint8 [K//2, N] (or [L, K//2, N] when stacked)
    scales: jnp.ndarray   # [K//group, N] float
    zeros: jnp.ndarray    # [K//group, N] float (zero-point in q domain)

    @property
    def k(self) -> int:
        return self.packed.shape[-2] * 2

    @property
    def n(self) -> int:
        return self.packed.shape[-1]

    @property
    def group_size(self) -> int:
        return self.k // self.scales.shape[-2]


def pack_int4(q: np.ndarray) -> np.ndarray:
    """Pack [K, N] uint4 values (0..15) into uint8 [K//2, N] nibble-split-K."""
    k = q.shape[-2]
    assert k % 2 == 0
    lo = q[..., : k // 2, :].astype(np.uint8)
    hi = q[..., k // 2:, :].astype(np.uint8)
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_int4` -> uint8 values 0..15, shape [K, N]."""
    lo = packed & jnp.uint8(0xF)
    hi = packed >> jnp.uint8(4)
    return jnp.concatenate([lo, hi], axis=-2)


def quantize_weight_int4(w, group_size: int = 128) -> QuantizedWeight:
    """Per-group asymmetric min/max int4 quantization of a [K, N] weight.

    Matches the AWQ packing math (reference: lmdeploy/lite/quantization/
    weight/quantizer.py): q = clamp(round(w/s) + z, 0, 15),
    s = (max-min)/15, z = round(-min/s).
    """
    w = np.asarray(w, np.float32)
    k, n = w.shape
    assert k % group_size == 0, (k, group_size)
    g = w.reshape(k // group_size, group_size, n)
    gmax = g.max(axis=1)
    gmin = g.min(axis=1)
    scales = np.maximum((gmax - gmin) / 15.0, 1e-8)
    zeros = np.clip(np.round(-gmin / scales), 0, 15)
    q = np.clip(np.round(g / scales[:, None, :]) + zeros[:, None, :], 0, 15)
    q = q.reshape(k, n).astype(np.uint8)
    return QuantizedWeight(
        packed=jnp.asarray(pack_int4(q)),
        scales=jnp.asarray(scales, jnp.bfloat16),
        zeros=jnp.asarray(zeros, jnp.bfloat16),
    )


def dequantize(qw: QuantizedWeight, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize the bf16 weight (testing / XLA fallback path)."""
    q = unpack_int4(qw.packed).astype(jnp.float32)
    g = qw.group_size
    s = jnp.repeat(qw.scales.astype(jnp.float32), g, axis=-2)
    z = jnp.repeat(qw.zeros.astype(jnp.float32), g, axis=-2)
    return ((q - z) * s).astype(dtype)


# Set by ops/pallas/quant_matmul.py when the Pallas path is enabled; takes
# (x, qw, fuse_silu) and returns the matmul output.
_PALLAS_QMM = None


def register_pallas_qmm(fn) -> None:
    global _PALLAS_QMM
    _PALLAS_QMM = fn


def use_pallas() -> bool:
    return _PALLAS_QMM is not None


def linear(x: jnp.ndarray, w, bias: Optional[jnp.ndarray] = None,
           fuse_silu_gate: bool = False) -> jnp.ndarray:
    """Dense dispatch. ``w`` is a bf16 [K, N] array or a QuantizedWeight.

    With ``fuse_silu_gate``, w holds fused [K, 2I] gate|up weights and the
    output is silu(x@w_gate) * (x@w_up) — the reference's kFusedSiluFfn
    epilogue (LlamaLinear.h:73).
    """
    if isinstance(w, QuantizedWeight):
        if _PALLAS_QMM is not None:
            out = _PALLAS_QMM(x, w, fuse_silu_gate)
            if bias is not None:
                out = out + bias
            return out
        wd = dequantize(w, jnp.bfloat16)
    else:
        wd = w
    out = jnp.dot(x.astype(wd.dtype), wd,
                  preferred_element_type=jnp.float32)
    if fuse_silu_gate:
        gate, up = jnp.split(out, 2, axis=-1)
        out = jax.nn.silu(gate) * up
    out = out.astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


__all__ = ['QuantizedWeight', 'pack_int4', 'unpack_int4',
           'quantize_weight_int4', 'dequantize', 'linear',
           'register_pallas_qmm', 'use_pallas']
