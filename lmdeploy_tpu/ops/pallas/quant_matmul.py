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


def pack_nibbles(q) -> 'np.ndarray | jnp.ndarray':
    """[..., K, N] uint8 int4-values (0..15) -> [..., K/2, N] packed:
    low nibble = rows [0, K/2), high nibble = rows [K/2, K).

    Dispatches on the input type: a jax Array packs ON ITS DEVICE (a 7B
    engine's qvals may live on a remote TPU behind a ~35 ms-RTT tunnel —
    np.asarray here would drag ~3.4 GB to the host at engine startup and
    stall it for many minutes), numpy stays numpy (converter / disk
    path).  The nibble math widens to i32 first, mirroring the kernel
    (u8 shifts are the risky class on this stack)."""
    xp = jnp if isinstance(q, jax.Array) else np
    k = q.shape[-2]
    assert k % 2 == 0, k
    lo = q[..., : k // 2, :].astype(xp.int32)
    hi = q[..., k // 2:, :].astype(xp.int32)
    return (lo | (hi << 4)).astype(xp.uint8)


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
    g = pl.program_id(2)                        # grid (mi, ni, gi)

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


def _auto_block_n(n: int, mp: int, m_grid: bool = False) -> int:
    """Largest lane-aligned divisor of ``n`` whose kernel working set
    fits the ~16MB VMEM scoped budget.

    MEASURED (v5e, .r4/kernel_tune3.log, w1 4096x11008 @ M=1): the N
    tile IS the kernel's performance: bn=256 streams 88.7 GB/s of packed
    bytes (strided 256B row segments + 71k grid steps/token) while
    bn=11008 (full rows, 1.4MB contiguous DMAs) hits 900 GB/s effective
    — HBM-saturated, 10x, true sub-byte speed.  Restructured variants
    (multi-group blocks w/ scale-on-weight, i32-lane repack) measured
    395-454 GB/s: unnecessary.  The budget terms (calibrated against a
    measured 17.88M scoped-vmem OOM at [512, 5504] blocks and the
    measured-OK [128, 11008]): u8 weight block double-buffered
    (2x128xbn) + the i32 nibble-widen temp (4B/value, 512xbn — this is
    what OOMs big blocks; the bf16 halves fuse into the MXU feed) + the
    [mp, bn] f32 accumulator.

    ``m_grid`` selects the M-BLOCKED (prefill) regime, whose working set
    is ~3x the accumulator, not ~1.3x: with an mi grid axis Mosaic keeps
    the revisited f32 out block double-buffered AND the two dot temps
    live (measured 22.23M at [bm=256, bn=6144] — 768*bn + ~11.6*bm*bn,
    .r4/prefill_tput:kernel2.log — where the single-M-block model
    predicted 11.8M).  The 12*mp term reproduces that OOM as 23.6M
    (conservative by 6%) while keeping the chip-verified decode picks
    unchanged (the decode path never sets m_grid)."""
    # override for co-residency with VMEM consumers (the xplane profiler
    # instruments kernels and a near-full scoped budget then
    # RESOURCE_EXHAUSTEDs — trace harnesses set a smaller value)
    import os
    budget = int(os.environ.get('LMDEPLOY_TPU_PACKED_VMEM_BUDGET',
                                '12500000'))
    # 11.6 B per accumulator value in the M-grid regime: the observed
    # 22.23M at [256, 6144] gives 11.13 B/value beyond the 768*bn weight
    # terms; 11.6 keeps ~6% margin without banning the good big-bn picks
    acc_bytes = 11.6 * mp if m_grid else 4 * mp
    best = 0
    d = 128
    while d <= n:
        if n % d == 0 and d * (768 + acc_bytes) <= budget:
            best = d
        d += 128
    # no lane-aligned divisor (sub-128 TP shards of tiny test models):
    # bn == n is always Mosaic-legal ("equal to the array dim")
    return best or n


def _choose_tiles(m: int, n: int, block_m: int,
                  block_n: int | None) -> tuple[int, int, int]:
    """(bm, mp, bn) for the kernel grid: pad M to the bf16 sublane tile
    (single-block decode/verify regime) or tile it at ``block_m``
    (prefill M-grid regime).  The N tile is the kernel's bandwidth
    (full rows 900 GB/s, bn=256 only 88.7): when the VMEM budget forces
    a tiny bn at this bm, HALVE bm instead — n=11008's lane-aligned
    divisor ladder is {128, 256, 5504, 11008}, so [bm=128, bn=5504]
    beats [bm=256, bn=256] decisively."""
    if m <= block_m:
        bm = mp = max(16, -(-m // 16) * 16)
        if block_n is None:
            block_n = _auto_block_n(n, bm)
    else:
        bm = block_m
        if block_n is None:
            while True:
                block_n = _auto_block_n(n, bm, m_grid=True)
                if block_n >= 1024 or bm <= 128:
                    break
                bm //= 2
        mp = -(-m // bm) * bm
    bn = min(block_n, n)
    if n % bn:
        bn = max((d for d in range(128, block_n + 1, 128)
                  if n % d == 0), default=n)
    return bm, mp, bn


def packed_int4_matmul(x: jnp.ndarray, packed: jnp.ndarray,
                       scales: jnp.ndarray, layer, *,
                       block_n: int | None = None,
                       block_m: int = 256,
                       interpret: bool = False) -> jnp.ndarray:
    """``x [M, K] @ unpacked(packed)[layer] * scales[layer]`` -> [M, N] f32.

    The UNSCALED-zero-point product: the caller subtracts the algebraic
    ``rowsum_g(x) @ (scales * zeros)[layer]`` term (ops/linear.py).

    Serves BOTH regimes: decode/verify (M <= block_m: one M block,
    full-N row tiles when VMEM allows — HBM-saturated sub-byte
    streaming) and prefill (M > block_m: an M grid axis; each packed
    tile is DMA'd once and feeds block_m activation rows, so the kernel
    is MXU-bound instead of the XLA path's unpack-to-bf16
    materialization).

    Args:
      x: [M, K] activations (any float dtype; cast to bf16).
      packed: [L, K/2, N] uint8 (``pack_nibbles`` layout).
      scales: [L, G, 1, N] per-group scales (G = K / group_size) — the
        unit sublane dim makes the (1, 1, 1, bn) block Mosaic-legal.
        [L, G, N] is accepted and reshaped, but callers inside a layer
        scan MUST pre-shape: the in-trace reshape relayouts the full
        array EVERY loop iteration (measured: ~half the decode step went
        to these scales copies, .r4/trace_packed.log).
      layer: int32 scalar (traced ok) — which stacked layer to use.
      block_m: M tile for the prefill regime (M pads up to a multiple).
    """
    # Mosaic compiles only on real TPU; CPU (tests) runs interpret mode
    interpret = interpret or jax.devices()[0].platform != 'tpu'
    m, k = x.shape
    l_dim, k2, n = packed.shape
    assert k == 2 * k2, (k, k2)
    if scales.ndim == 3:
        scales = scales[:, :, None, :]
    g_groups = scales.shape[1]
    group = k // g_groups
    g2 = g_groups // 2
    assert g2 * 2 == g_groups and k2 % group == 0 and k2 // group == g2

    bm, mp, bn = _choose_tiles(m, n, block_m, block_n)
    assert n % bn == 0, (n, bn)
    xb = x.astype(jnp.bfloat16)
    if mp != m:
        xb = jnp.pad(xb, ((0, mp - m), (0, 0)))
    x_lo = xb[:, :k2]
    x_hi = xb[:, k2:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        # g innermost: the [bm, bn] f32 accumulator block is revisited
        # across the group axis (init at gi == 0)
        grid=(mp // bm, n // bn, g2),
        in_specs=[
            pl.BlockSpec((bm, group), lambda mi, ni, gi, lr: (mi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, group), lambda mi, ni, gi, lr: (mi, gi),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, group, bn),
                         lambda mi, ni, gi, lr: (lr[0], gi, ni),
                         memory_space=pltpu.VMEM),
            # scales carry a unit sublane dim ([L, G, 1, N]): Mosaic
            # requires the block's second-to-last dim be a multiple of 8
            # OR equal to the array dim — (1, bn) on [..., 1, N] is legal
            # where (1, bn) on [..., G, N] is not (chip-verified)
            pl.BlockSpec((1, 1, 1, bn),
                         lambda mi, ni, gi, lr: (lr[0], gi, 0, ni),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, bn),
                         lambda mi, ni, gi, lr: (lr[0], g2 + gi, 0, ni),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mi, ni, gi, lr: (mi, ni),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_mm_kernel, n_g2=g2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, n), jnp.float32),
        interpret=interpret,
    )(jnp.reshape(layer, (1,)).astype(jnp.int32),
      x_lo, x_hi, packed, scales, scales)
    return out[:m]


__all__ = ['pack_nibbles', 'unpack_nibbles_jax', 'packed_int4_matmul']
