"""Pallas paged prefill (context) attention.

The reference's prefill path is a vendored flash-attention-2 fork with
per-batch KV pointer indirection and mismatched Q/K lengths for history
reuse (src/turbomind/models/llama/flash_attention2/, flash_api.cpp:167).
Here: block-wise online-softmax attention for ONE slot's prompt chunk,
reading K/V straight from the paged pool (the XLA fallback gathers the
full max_pages extent — ~134MB per layer per chunk).

Grid: one program per 128-token q block; each walks only the pages that
are causally visible to its block, double-buffering page DMA.  The chunk
attends over cached history plus itself (causal mask offset by the
block's absolute positions — the FA2 fork's mismatched-QK capability).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .paged_attention import dequant_tile, kv_bits_of

Q_BLOCK = 128


def _prefill_kernel(page_table_ref, end_pos_ref, layer_ref,  # prefetch
                    q_ref, k_hbm, v_hbm, qp_ref,
                    o_ref,
                    k_buf, v_buf, sem,
                    *, page_size: int, kh: int, g: int, dh: int,
                    start_pos: None, kv_bits: int, scale: float,
                    q_block: int = Q_BLOCK):
    si = pl.program_id(0)           # batch slot (grid dim 0)
    qi = pl.program_id(1)           # q block within the slot's chunk
    layer = layer_ref[0]
    start = end_pos_ref[1, si]      # absolute position of ids[0]
    ctx_end = end_pos_ref[0, si]    # start + valid length
    blk_start = start + qi * q_block
    # pages causally visible to this block's LAST query
    last_q_pos = jnp.minimum(blk_start + q_block - 1, ctx_end - 1)
    num_pages = jnp.maximum(jax.lax.div(last_q_pos, page_size) + 1, 1)

    q = q_ref[0].astype(jnp.float32) * scale           # [QB, KH*G, Dh]
    qh = q.reshape(q_block, kh, g, dh).transpose(1, 0, 2, 3) \
          .reshape(kh, q_block * g, dh)                # [KH, QB*G, Dh]
    q_pos = blk_start + jax.lax.broadcasted_iota(
        jnp.int32, (1, q_block, 1, 1), 1)              # [1, QB, 1, 1]

    def dma(slot, page_idx):
        phys = page_table_ref[si, page_idx]
        return (pltpu.make_async_copy(k_hbm.at[layer, phys], k_buf.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_hbm.at[layer, phys], v_buf.at[slot],
                                      sem.at[slot, 1]))

    for c in dma(0, 0):
        c.start()

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < num_pages)
        def _():
            for c in dma(jax.lax.rem(i + 1, 2), i + 1):
                c.start()

        for c in dma(slot, i):
            c.wait()
        k = dequant_tile(k_buf[slot], qp_ref[0], qp_ref[1], kv_bits)
        v = dequant_tile(v_buf[slot], qp_ref[2], qp_ref[3], kv_bits)
        k_t = k.transpose(1, 2, 0)                     # [KH, Dh, page]
        v_t = v.transpose(1, 0, 2)                     # [KH, page, Dh]
        s = jax.lax.dot_general(                       # [KH, QB*G, page]
            qh, k_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        kv_pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, 1, page_size), 3)        # [1,1,1,page]
        ok = (kv_pos <= q_pos) & (kv_pos < ctx_end)    # [1, QB, 1, page]
        ok = jnp.broadcast_to(ok, (kh, q_block, g, page_size)) \
                .reshape(kh, q_block * g, page_size)
        s = jnp.where(ok, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(                      # [KH, QB*G, Dh]
            p, v_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        return m_new, l_new, acc

    m0 = jnp.full((kh, q_block * g), -1e30, jnp.float32)
    l0 = jnp.zeros((kh, q_block * g), jnp.float32)
    acc0 = jnp.zeros((kh, q_block * g, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-20)[..., None]       # [KH, QB*G, Dh]
    out = out.reshape(kh, q_block, g, dh).transpose(1, 0, 2, 3)
    o_ref[0] = out.reshape(q_block, kh * g, dh).astype(o_ref.dtype)


def verify_q_block(t: int) -> int:
    """Q block for a short speculative-verify chunk: the smallest
    8-sublane multiple covering ``t`` instead of the full 128-row prefill
    block.  A k=4 verify (t=5) otherwise pads its attention dots 25x —
    the f32 QK^T/PV work is ~96% padding at kp1=5.

    DEFAULT ON — measured A/B on chip (v5e, .r5/spec_overhead cells,
    2026-08-20): greedy k=4 verify rounds drop 15.64 -> 10.82 ms
    (189.6 -> 274.1 tok/s bs1 — above the reference's 206.4 baseline);
    parity vs the gather reference in
    tests/test_pallas.py::test_paged_prefill_attention_verify_qblock8.
    LMDEPLOY_TPU_VERIFY_QBLOCK=0 (or 128) restores the classic 128-row
    block; any other multiple of 8 sets the sublane cover explicitly.
    8 sublanes is the f32 tile floor so smaller blocks can't help
    further."""
    import os
    mode = os.environ.get('LMDEPLOY_TPU_VERIFY_QBLOCK', 'auto')
    if t >= Q_BLOCK:
        return Q_BLOCK
    if mode in ('auto', ''):
        step = 8
    else:
        step = int(mode)
        if step <= 0 or step >= Q_BLOCK:
            return Q_BLOCK
        step = max(8, -(-step // 8) * 8)
    return -(-t // step) * step


def paged_prefill_attention_batched(q, k_cache, v_cache, layer, page_tables,
                                    start_pos, context_end, qparams4, *,
                                    quantized: bool, interpret: bool = False,
                                    q_block: int = Q_BLOCK):
    """Prefill attention of MULTIPLE slots' chunks over the paged pool in
    one kernel — grid (slot, q-block).  The reference chunks context
    decode across all newly admitted requests in one pass
    (LlamaBatch.cc:795-858); this is the TPU equivalent, so concurrent
    admissions don't serialize their TTFT.

    Args:
      q: [B, T, KH*G, Dh] rope'd queries (T a multiple of 128; padding
        tokens/rows allowed — garbage output, masked upstream).
      k_cache/v_cache: FULL pool [L, P, page, KH, Dh] with K/V written.
      layer: int32 scalar.
      page_tables: int32 [B, max_pages], pool-local page ids.
      start_pos: int32 [B] absolute position of each row's q[0].
      context_end: int32 [B] = start_pos + valid chunk length (== start
        for padding rows: they do one masked page pass and write zeros).
      qparams4: f32 [4] per-layer INT8/INT4 qparams.
    Returns [B, T, KH*G, Dh] in q.dtype.
    """
    b, t, h, dh = q.shape
    assert t % q_block == 0, (t, q_block)
    kh = k_cache.shape[-2]
    g = h // kh
    page_size = k_cache.shape[-3]
    dp = k_cache.shape[-1]           # pool feature width (Dh/2 for int4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b, t // q_block),
        in_specs=[
            pl.BlockSpec((1, q_block, h, dh), lambda s, i, *_: (s, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, q_block, h, dh),
                               lambda s, i, *_: (s, i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, page_size, kh, dp), k_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _prefill_kernel, page_size=page_size, kh=kh, g=g, dh=dh,
        start_pos=None, kv_bits=kv_bits_of(k_cache.dtype, quantized),
        scale=dh ** -0.5, q_block=q_block)
    end_pos = jnp.stack([jnp.asarray(context_end, jnp.int32),
                         jnp.asarray(start_pos, jnp.int32)])  # [2, B]
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, h, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 2 ** 20),
        interpret=interpret,
    )(jnp.maximum(page_tables, 0), end_pos,
      jnp.reshape(layer, (1,)).astype(jnp.int32), q, k_cache, v_cache,
      jnp.asarray(qparams4, jnp.float32))


def paged_prefill_attention(q, k_cache, v_cache, layer, page_row,
                            start_pos, context_end, qparams4, *,
                            quantized: bool, interpret: bool = False):
    """Single-slot wrapper over :func:`paged_prefill_attention_batched`.

    q: [T, KH*G, Dh]; page_row: [max_pages]; start_pos/context_end
    scalars.  Returns [T, KH*G, Dh].
    """
    out = paged_prefill_attention_batched(
        q[None], k_cache, v_cache, layer, page_row[None],
        jnp.reshape(start_pos, (1,)), jnp.reshape(context_end, (1,)),
        qparams4, quantized=quantized, interpret=interpret)
    return out[0]


__all__ = ['paged_prefill_attention', 'paged_prefill_attention_batched',
           'Q_BLOCK']
