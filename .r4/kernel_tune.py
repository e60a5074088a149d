"""Packed-int4 Pallas kernel: formulation + tile sweep on the live chip.

The round-4 flag A/B measured the current packed kernel at 26 tok/s bs1
(vs 59.7 byte-path): ~92 GB/s effective on packed bytes where the floor
is ~660.  Candidate causes: strided 512B-row weight DMAs, per-grid-step
overhead (71k steps/token), u8->i32 relayout cost in Mosaic, VPU unpack
ALU count.  This sweep isolates them:

  bf16   : stacked bf16 kernel (DMA+dot only) -> achievable ceiling
  byte   : stacked u8 kernel (widen+cvt+dot)  -> u8 relayout cost
  v0:BN  : current kernel at block_n=BN       -> tile-shape sensitivity
  fullrow: current kernel, bn = full N        -> contiguous DMA
  gblock : multi-group block, scale-on-weight, ONE dot per half
  i32pack: weights repacked as i32 [L, K/8, N] (8 nibbles per lane),
           native 32-bit loads, no u8 dtype anywhere

Each timing: in-jit fori loop (iters matmuls, x varies by i), one
np.asarray fetch, empty-loop baseline subtracted, min of 3.  Prints one
JSON line per config AS IT LANDS (a later compile hang keeps earlier
verdicts).
"""
import functools
import json
import sys
import time

sys.path.insert(0, '/root/repo')

import numpy as np

import os as _os
ITERS = int(_os.environ.get('KT_ITERS', '100'))
INTERPRET = False
REPEATS = 3
M = 1          # decode row count


def timed(fn, shape_bytes):
    import jax
    import jax.numpy as jnp
    np.asarray(fn())  # compile + warm

    def once():
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    best = min(once() for _ in range(REPEATS))
    return best


def make_loop(mm, x, n):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run():
        def step(i, acc):
            return acc + mm(x + i.astype(x.dtype))
        return jax.lax.fori_loop(0, ITERS, step,
                                 jnp.zeros((x.shape[0], n), jnp.float32))
    return run


def empty_baseline():
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x=jnp.zeros((8, 128), jnp.float32)):
        def step(i, acc):
            return acc
        return jax.lax.fori_loop(0, ITERS, step, x)
    return timed(run, 0)


def report(name, wall_s, rtt_s, bytes_per_iter):
    per = max(wall_s - rtt_s, 1e-9) / ITERS
    gbs = bytes_per_iter / per / 1e9
    print(json.dumps({'config': name, 'ms_per_mm': round(per * 1e3, 4),
                      'eff_gb_s': round(gbs, 1)}), flush=True)


# ---------------------------------------------------------------- variants

def kernel_bf16(x, w):
    """Stacked bf16 [L, K, N] matmul via scalar-prefetch layer index:
    pure DMA + MXU — the bandwidth ceiling for any Pallas formulation."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    _, _, n = w.shape
    mp = 16
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    bk = 128          # 1x128xN bf16 = 2.8MB/block, double-buffered

    def body(layer_ref, x_ref, w_ref, o_ref):
        ki = pl.program_id(0)
        acc = jax.lax.dot_general(x_ref[...], w_ref[0],
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = acc

        @pl.when(ki > 0)
        def _():
            o_ref[...] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec((mp, bk), lambda ki, lr: (0, ki)),
            pl.BlockSpec((1, bk, n), lambda ki, lr: (lr[0], ki, 0)),
        ],
        out_specs=pl.BlockSpec((mp, n), lambda ki, lr: (0, 0)),
    )
    out = pl.pallas_call(body, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((mp, n),
                                                        jnp.float32),
                         interpret=INTERPRET)(
        jnp.zeros((1,), jnp.int32), xb, w)
    return out[:m]


def kernel_byte(x, q):
    """Stacked byte-per-int4 [L, K, N] u8 kernel: widen->bf16->dot.
    Measures the u8 path cost WITHOUT nibble work (and doubles as the
    no-copy byte-residency fallback)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    _, _, n = q.shape
    mp = 16
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    bk = 256          # 1x256xN u8 = 2.8MB/block, double-buffered

    def body(layer_ref, x_ref, w_ref, o_ref):
        ki = pl.program_id(0)
        wb = w_ref[0].astype(jnp.int32).astype(jnp.bfloat16)
        acc = jax.lax.dot_general(x_ref[...], wb,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)

        @pl.when(ki == 0)
        def _():
            o_ref[...] = acc

        @pl.when(ki > 0)
        def _():
            o_ref[...] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(k // bk,),
        in_specs=[
            pl.BlockSpec((mp, bk), lambda ki, lr: (0, ki)),
            pl.BlockSpec((1, bk, n), lambda ki, lr: (lr[0], ki, 0)),
        ],
        out_specs=pl.BlockSpec((mp, n), lambda ki, lr: (0, 0)),
    )
    out = pl.pallas_call(body, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((mp, n),
                                                        jnp.float32),
                         interpret=INTERPRET)(
        jnp.zeros((1,), jnp.int32), xb, q)
    return out[:m]


def kernel_gblock(x, packed, scales, gb, bn):
    """Multi-group blocks + scale-on-weight: block (1, group*gb, bn),
    per-group scales applied to the UNPACKED bf16 weight tile (one VPU
    multiply per value), then ONE dot per nibble half over the whole
    gb*group K-slab.  Kills the per-group dot/rescale overhead of v0."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    l_dim, k2, n = packed.shape
    g = scales.shape[-2]
    group = k // g
    g2 = g // 2
    assert g2 % gb == 0, (g2, gb)
    if n % bn:
        bn = max((d for d in range(128, bn + 1, 128) if n % d == 0),
                 default=n)
    mp = 16
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    x_lo, x_hi = xb[:, :k2], xb[:, k2:]
    bk = group * gb

    def body(layer_ref, xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref):
        gi = pl.program_id(1)
        w32 = w_ref[0].astype(jnp.int32)          # [bk, bn]
        lo = (w32 & 0xF).astype(jnp.bfloat16).reshape(gb, group, -1)
        hi = (w32 >> 4).astype(jnp.bfloat16).reshape(gb, group, -1)
        slo = slo_ref[0, :, 0, :].astype(jnp.bfloat16)[:, None, :]
        shi = shi_ref[0, :, 0, :].astype(jnp.bfloat16)[:, None, :]
        wlo = (lo * slo).reshape(bk, -1)
        whi = (hi * shi).reshape(bk, -1)
        acc = jax.lax.dot_general(xlo_ref[...], wlo,
                                  (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        acc += jax.lax.dot_general(xhi_ref[...], whi,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

        @pl.when(gi == 0)
        def _():
            o_ref[...] = acc

        @pl.when(gi > 0)
        def _():
            o_ref[...] += acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, g2 // gb),
        in_specs=[
            pl.BlockSpec((mp, bk), lambda ni, gi, lr: (0, gi)),
            pl.BlockSpec((mp, bk), lambda ni, gi, lr: (0, gi)),
            pl.BlockSpec((1, bk, bn), lambda ni, gi, lr: (lr[0], gi, ni)),
            pl.BlockSpec((1, gb, 1, bn),
                         lambda ni, gi, lr: (lr[0], gi, 0, ni)),
            pl.BlockSpec((1, gb, 1, bn),
                         lambda ni, gi, lr: (lr[0], (g2 // gb) + gi, 0, ni)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda ni, gi, lr: (0, ni)),
    )
    out = pl.pallas_call(body, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((mp, n),
                                                        jnp.float32),
                         interpret=INTERPRET)(
        jnp.zeros((1,), jnp.int32), x_lo, x_hi, packed,
        scales[:, :, None, :], scales[:, :, None, :])
    return out[:m]


def pack_i32(q):
    """[L, K, N] u8 int4 values -> [L, K/8, N] int32: lane bits hold 8
    K-slabs' nibbles (slab j = rows [j*K/8, (j+1)*K/8))."""
    q = np.asarray(q, np.uint32)
    l, k, n = q.shape
    s = k // 8
    out = np.zeros((l, s, n), np.uint32)
    for j in range(8):
        out |= q[:, j * s:(j + 1) * s, :] << (4 * j)
    return out.astype(np.int32)


def kernel_i32pack(x, packed32, scales, gb, bn):
    """i32-lane packing: native 32-bit loads, zero u8 relayout.  Each
    i32 lane holds 8 nibbles from 8 K-slabs; kernel extracts the 8
    slabs, scales-on-weight per group, one dot per slab (concat K)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    m, k = x.shape
    l_dim, k8, n = packed32.shape
    assert k == 8 * k8
    g = scales.shape[-2]
    group = k // g
    gs = g // 8                       # groups per slab
    assert gs % gb == 0 or gb == gs, (gs, gb)
    gb = min(gb, gs)
    if n % bn:
        bn = max((d for d in range(128, bn + 1, 128) if n % d == 0),
                 default=n)
    mp = 16
    xb = jnp.pad(x.astype(jnp.bfloat16), ((0, mp - m), (0, 0)))
    # x as [8, K/8] slabs stacked on rows: xs[j] = x[:, j*k8:(j+1)*k8]
    xs = jnp.stack([xb[:, j * k8:(j + 1) * k8] for j in range(8)], 0)
    bk = group * gb                   # packed rows per block

    def body(layer_ref, x_ref, w_ref, s_ref, o_ref):
        gi = pl.program_id(1)
        w32 = w_ref[0]                               # [bk, bn] i32
        acc = None
        for j in range(8):
            nib = ((w32 >> (4 * j)) & 0xF).astype(jnp.bfloat16)
            sj = s_ref[0, j, :, 0, :].astype(jnp.bfloat16)  # [gb, bn]
            wj = (nib.reshape(gb, group, -1)
                  * sj[:, None, :]).reshape(bk, -1)
            d = jax.lax.dot_general(x_ref[j], wj,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = d if acc is None else acc + d

        @pl.when(gi == 0)
        def _():
            o_ref[...] = acc

        @pl.when(gi > 0)
        def _():
            o_ref[...] += acc

    # scales regrouped [L, 8, G/8, N] so slab j's group scales sit at
    # [l, j, gi*gb:(gi+1)*gb, :]
    s4 = scales.reshape(scales.shape[0], 8, gs, n)[:, :, :, None, :]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // bn, gs // gb),
        in_specs=[
            pl.BlockSpec((8, mp, bk), lambda ni, gi, lr: (0, 0, gi)),
            pl.BlockSpec((1, bk, bn), lambda ni, gi, lr: (lr[0], gi, ni)),
            pl.BlockSpec((1, 8, gb, 1, bn),
                         lambda ni, gi, lr: (lr[0], 0, gi, 0, ni)),
        ],
        out_specs=pl.BlockSpec((mp, bn), lambda ni, gi, lr: (0, ni)),
    )
    out = pl.pallas_call(body, grid_spec=grid_spec,
                         out_shape=jax.ShapeDtypeStruct((mp, n),
                                                        jnp.float32),
                         interpret=INTERPRET)(
        jnp.zeros((1,), jnp.int32), xs, packed32, s4)
    return out[:m]


def main():
    import jax
    import jax.numpy as jnp
    from lmdeploy_tpu.ops.pallas.quant_matmul import (pack_nibbles,
                                                      packed_int4_matmul)

    K, N = 4096, 11008                 # w1 shape — the biggest stream
    L = 1
    GROUP = 128
    G = K // GROUP
    rng = np.random.default_rng(0)
    qv = rng.integers(0, 16, (L, K, N), dtype=np.uint8)
    scales_np = (rng.random((L, G, N), np.float32) * 0.004).astype(
        np.float32)

    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    packed = jnp.asarray(pack_nibbles(qv))
    scales = jnp.asarray(scales_np, jnp.bfloat16)
    rtt = empty_baseline()
    print(json.dumps({'config': 'rtt', 'ms': round(rtt * 1e3, 2)}),
          flush=True)

    pk_bytes = K // 2 * N
    stages = set(sys.argv[1:]) or {'bf16', 'byte', 'v0', 'gblock',
                                   'i32pack'}

    # ---- ceiling: bf16 stacked (2 bytes/value = 4x packed bytes)
    if 'bf16' in stages:
        wb = jnp.asarray(rng.standard_normal((L, K, N)), jnp.bfloat16)
        run = make_loop(lambda xx: kernel_bf16(xx, wb), x, N)
        report('bf16_ceiling(4x bytes)', timed(run, 0), rtt, K * N * 2)
        del wb

    # ---- byte path in pallas (2x packed bytes)
    if 'byte' in stages:
        qb = jnp.asarray(qv)
        run = make_loop(lambda xx: kernel_byte(xx, qb), x, N)
        report('byte_u8(2x bytes)', timed(run, 0), rtt, K * N)
        del qb

    # lane-aligned N tiles of 11008: multiples of 128 that divide it
    if 'v0' in stages:
        for bn in (5504, 11008):
            run = make_loop(
                lambda xx, bn=bn: packed_int4_matmul(xx, packed, scales,
                                                     0, block_n=bn), x, N)
            report(f'v0_bn{bn}', timed(run, 0), rtt, pk_bytes)

    # ---- gblock: multi-group block + scale-on-weight
    # VMEM: w block = gb*128*bn u8 double-buffered; cap ~5.6MB/block
    if 'gblock' in stages:
        for gb, bn in ((2, 5504), (1, 11008)):  # i32 widen temp = 4B/value caps block rows
            run = make_loop(
                lambda xx, gb=gb, bn=bn: kernel_gblock(xx, packed,
                                                       scales, gb, bn),
                x, N)
            report(f'gblock_gb{gb}_bn{bn}', timed(run, 0), rtt, pk_bytes)

    # ---- i32pack (w block = gb*128*bn i32 — 4 bytes/lane, 8 nibbles)
    if 'i32pack' in stages:
        p32 = jnp.asarray(pack_i32(qv))
        for gb, bn in ((1, 5504),):
            run = make_loop(
                lambda xx, gb=gb, bn=bn: kernel_i32pack(xx, p32, scales,
                                                        gb, bn), x, N)
            report(f'i32pack_gb{gb}_bn{bn}', timed(run, 0), rtt,
                   pk_bytes)

    print(json.dumps({'config': 'done'}), flush=True)


if __name__ == '__main__':
    main()
