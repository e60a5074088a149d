"""Pallas packed-int4 matmul — true sub-byte weight residency.

The reference's defining W4A16 feature is gemm_s_f16: weights stream
from HBM 4-bit PACKED and dequantize in-register on the way into the
tensor-core feed (src/turbomind/kernels/gemm_s_f16/common.h:115-156,
kernel zoo + Measure autotune gemm_s4_f16.cu:73-206).  Every prior
attempt at sub-byte residency on this TPU stack failed because it
unpacked OUTSIDE a dot (u4 bitcast 34 GB/s, standalone Mosaic nibble
unpack 58 GB/s — both dominated by materializing the 2x-sized unpacked
buffer).  This kernel is the remaining formulation: the packed uint8
tile is DMA'd to VMEM, the nibble split happens IN-KERNEL on the VPU,
and both halves feed MXU dots immediately — the unpacked data never
exists outside VMEM, so HBM sees true 4-bit traffic (half of the
byte-per-int4 resident path, the repo's measured ~98 tok/s bs1 floor).

Packing layout (``pack_nibbles``): the K rows split in HALVES, not
interleaved — byte ``p[k', n]`` holds original row ``k'`` in the low
nibble and row ``K/2 + k'`` in the high nibble.  The activation split
is then two contiguous column slices (free), no lane interleaving
anywhere, and quantization groups stay aligned within each half (K/2 is
a multiple of the group size for every supported shape).

Grid: ``(N / BN, G/2)`` — the g axis is innermost so the [M, BN] f32
accumulator block is revisited; one grid step DMAs one packed
[group, BN] tile, unpacks, and accumulates two group-dots rescaled by
their per-group scales.  The asymmetric zero-point term is algebraic
and stays OUTSIDE the kernel (one tiny [M, G] @ [G, N] dot — see
ops/linear.py docstring).

The stacked-layer dimension rides scalar prefetch exactly like the
paged-attention kernels: the FULL [L, ...] arrays stay in HBM and the
index_map selects the layer's tiles, so calling this inside the
per-layer ``lax.scan`` never copies a weight slice.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def pack_nibbles(q: np.ndarray) -> np.ndarray:
    """[..., K, N] uint8 int4-values (0..15) -> [..., K/2, N] packed:
    low nibble = rows [0, K/2), high nibble = rows [K/2, K)."""
    q = np.asarray(q)
    k = q.shape[-2]
    assert k % 2 == 0, k
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2:, :]
    return (lo | (hi << 4)).astype(np.uint8)


def unpack_nibbles_jax(p: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_nibbles` in jnp (prefill/XLA regimes and
    tests): [..., K/2, N] u8 -> [..., K, N] u8 values 0..15."""
    lo = p & 0xF
    hi = p >> 4
    return jnp.concatenate([lo, hi], axis=-2)


def _mm_kernel(layer_ref,                       # scalar prefetch
               xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref,   # inputs
               out_ref,
               *, n_g2: int):
    g = pl.program_id(1)

    wp = w_ref[0]                               # [group, BN] u8
    # Mosaic has no native u8->bf16 convert NOR u8 shifts (arith.shrui
    # fails to legalize — chip-verified); widen to int32 FIRST, do the
    # nibble split there (i32 shrsi on 0..255 == shrui), then narrow
    # into the MXU feed.
    w32 = wp.astype(jnp.int32)
    lo = (w32 & 0xF).astype(jnp.bfloat16)
    hi = (w32 >> 4).astype(jnp.bfloat16)
    a = jax.lax.dot_general(xlo_ref[...], lo, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    b = jax.lax.dot_general(xhi_ref[...], hi, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc = (a * slo_ref[0, 0, 0].astype(jnp.float32)
           + b * shi_ref[0, 0, 0].astype(jnp.float32))

    @pl.when(g == 0)
    def _init():
        out_ref[...] = acc

    @pl.when(g > 0)
    def _accum():
        out_ref[...] += acc


def packed_int4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                       scales: jnp.ndarray, layer, *,
                       block_n: int = 512,
                       interpret: bool = False) -> jnp.ndarray:
    """``x [M, K] @ unpacked(packed)[layer] * scales[layer]`` -> [M, N] f32.

    The UNSCALED-zero-point product: the caller subtracts the algebraic
    ``rowsum_g(x) @ (scales * zeros)[layer]`` term (ops/linear.py).

    Args:
      x: [M, K] activations (any float dtype; cast to bf16).
      packed: [L, K/2, N] uint8 (``pack_nibbles`` layout).
      scales: [L, G, N] per-group scales (G = K / group_size).
      layer: int32 scalar (traced ok) — which stacked layer to use.
    """
    # Mosaic compiles only on real TPU; CPU (tests) runs interpret mode
    interpret = interpret or jax.devices()[0].platform != 'tpu'
    m, k = x.shape
    l_dim, k2, n = packed.shape
    assert k == 2 * k2, (k, k2)
    g_groups = scales.shape[-2]
    group = k // g_groups
    g2 = g_groups // 2
    assert g2 * 2 == g_groups and k2 % group == 0 and k2 // group == g2
    bn = min(block_n, n)
    if n % bn:
        # largest lane-aligned divisor of n that fits the budget — e.g.
        # the 7B FFN n=11008 (not a multiple of 512) tiles at 256
        bn = max((d for d in range(128, block_n + 1, 128) if n % d == 0),
                 default=n)
    assert n % bn == 0, (n, bn)

    # pad M to the bf16 sublane tile so Mosaic gets aligned blocks
    mp = max(16, -(-m // 16) * 16)
    xb = x.astype(jnp.bfloat16)
    if mp != m:
        xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
    x_lo = xb[:, :k2]
    x_hi = xb[:, k2:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, g2),
        in_specs=[
            pl.BlockSpec((mp, group), lambda ni, gi, lr: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((mp, group), lambda ni, gi, lr: (0, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, bn), lambda ni, gi, lr: (lr[0], gi, ni),
                         memory_space=pltpu.VMEM),
            # scales carry a unit sublane dim ([L, G, 1, N]): Mosaic
            # requires the block's second-to-last dim be a multiple of 8
            # OR equal to the array dim — (1, bn) on [..., 1, N] is legal
            # where (1, bn) on [..., G, N] is not (chip-verified)
            pl.BlockSpec((1, 1, 1, bn), lambda ni, gi, lr: (lr[0], gi, 0,
                                                            ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bn),
                         lambda ni, gi, lr: (lr[0], g2 + gi, 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda ni, gi, lr: (0, ni),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_g2=g2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_lo, x_hi, packed, scales[:, :, None, :], scales[:, :, None, :])
    return out[:m]


__all__ = ['pack_nibbles', 'unpack_nibbles_jax', 'packed_int4_matmul']
