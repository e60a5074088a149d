"""Pallas paged decode attention — the TPU rebuild of the reference's
decoder_masked_multihead_attention kernel (src/turbomind/kernels/
decoder_masked_multihead_attention_template.cuh: one CTA per (batch,
head), per-sample cache pointers, inline INT8 dequant, FP32-accum online
softmax, 1933 lines of CUDA).

Design here: one grid program per batch slot; the page table and
context lengths ride scalar prefetch (SMEM) so the kernel walks ONLY the
pages that actually hold context — the XLA fallback must gather the full
max_pages extent, which costs ~2x the whole weight-read time per decode
token.  The KV pool stays in HBM as the full [L, P, page, KH, Dh] array
(the layer index is a scalar operand — slicing the pool per layer in XLA
would copy ~GBs per step); pages stream HBM->VMEM with double-buffered
async DMA so the next page loads while the current one computes.  GQA
folds the q-head group into leading-batch [KH, G, page] matmuls.  INT8
KV dequantizes in-register from per-layer scales read out of SMEM
(reference QUANT_POLICY=4, cuh:976-1105).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kv_bits_of(cache_dtype, quantized: bool) -> int:
    """Static pool quantization width: 0 (bf16), 8 (int8) or 4
    (nibble-packed uint8, kvcache/paged.py half-split layout)."""
    if not quantized:
        return 0
    return 4 if cache_dtype == jnp.uint8 else 8


def dequant_tile(x, scale, zp, kv_bits: int):
    """Pool-dtype page tile -> f32.  kv_bits=4 unpacks the half-split
    nibble layout in-register (two slices + concat — lane-friendly, the
    quant_matmul technique) before the static-qparam dequant."""
    if kv_bits == 4:
        # widen to i32 BEFORE shifting: Mosaic cannot legalize u8 shifts
        # (arith.shrui — chip-verified in the packed-weight kernel)
        x32 = x.astype(jnp.int32)
        lo = x32 & 0xF
        hi = x32 >> 4
        q = jnp.concatenate([lo, hi], axis=-1)
        return (((q ^ 8) - 8).astype(jnp.float32) - zp) * scale
    if kv_bits == 8:
        return (x.astype(jnp.float32) - zp) * scale
    return x.astype(jnp.float32)


def _quant_pack(x_f32, scale, zp, kv_bits: int, out_dtype):
    """f32 [..., Dh] -> pool dtype ([..., Dh/2] uint8 when kv_bits=4)."""
    if kv_bits == 4:
        # pack in i32 and narrow LAST (u8 shifts fail Mosaic
        # legalization, see dequant_tile)
        q = jnp.clip(jnp.round(x_f32 / scale + zp), -8, 7) \
               .astype(jnp.int32) & 0xF
        dh2 = q.shape[-1] // 2
        return (q[..., :dh2] | (q[..., dh2:] << 4)).astype(jnp.uint8)
    if kv_bits == 8:
        q = jnp.round(x_f32 / scale + zp)
        return jnp.clip(q, -128, 127).astype(out_dtype)
    return x_f32.astype(out_dtype)


def _online_attend(b, ctx, layer, q, page_tables_ref, k_src, v_src,
                   k_buf, v_buf, sem, qp_ref, *, page_size: int, kh: int,
                   g: int, dh: int, kv_bits: int):
    """Shared double-buffered page walk + fp32 online-softmax attend.

    q: [KH*G, Dh] float32, already scaled.  Returns [KH*G, Dh] float32.
    """
    num_pages = jax.lax.div(ctx + page_size - 1, page_size)

    def dma(slot, page_idx):
        phys = page_tables_ref[b, page_idx]
        return (pltpu.make_async_copy(k_src.at[layer, phys], k_buf.at[slot],
                                      sem.at[slot, 0]),
                pltpu.make_async_copy(v_src.at[layer, phys], v_buf.at[slot],
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
        k_t = k.transpose(1, 2, 0)                        # [KH, Dh, page]
        v_t = v.transpose(1, 0, 2)                        # [KH, page, Dh]
        qh = q.reshape(kh, g, dh)
        s = jax.lax.dot_general(                          # [KH, G, page]
            qh, k_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        pos = i * page_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, page_size), 2)
        s = jnp.where(pos < ctx, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))       # [KH, G]
        p = jnp.exp(s - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1)
        pv = jax.lax.dot_general(                         # [KH, G, Dh]
            p, v_t, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc = acc * alpha[..., None] + pv
        return m_new, l_new, acc

    m0 = jnp.full((kh, g), -1e30, jnp.float32)
    l0 = jnp.zeros((kh, g), jnp.float32)
    acc0 = jnp.zeros((kh, g, dh), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-20)[..., None]
    return out.reshape(kh * g, dh)


def _decode_kernel(page_tables_ref, ctx_len_ref, layer_ref,  # scalar prefetch
                   q_ref, k_hbm, v_hbm, qp_ref,              # inputs
                   o_ref,                                    # output
                   k_buf, v_buf, sem,                        # scratch
                   *, page_size: int, kh: int, g: int, dh: int,
                   kv_bits: int, scale: float):
    b = pl.program_id(0)
    ctx = ctx_len_ref[b]
    layer = layer_ref[0]
    q = q_ref[:].astype(jnp.float32) * scale             # [KH*G, Dh]
    out = _online_attend(b, ctx, layer, q, page_tables_ref, k_hbm, v_hbm,
                         k_buf, v_buf, sem, qp_ref, page_size=page_size,
                         kh=kh, g=g, dh=dh, kv_bits=kv_bits)
    o_ref[:] = out.astype(o_ref.dtype)


def _decode_write_kernel(page_tables_ref, ctx_len_ref, layer_ref,
                         valid_ref,                        # prefetch
                         q_ref, kn_ref, vn_ref, k_in, v_in, qp_ref,
                         k_out, v_out, o_ref,
                         kq_buf, vq_buf, k_buf, v_buf, sem, wsem,
                         *, page_size: int, kh: int, g: int, dh: int,
                         kv_bits: int, scale: float):
    """Fused KV-append + paged attention for one decode step: stores the
    current token's K/V into the pool (in place via aliasing), then
    attends — replacing the per-layer XLA scatter + separate kernel
    (the reference's mmha does exactly this fusion: store at cuh:1434,
    attend over the cache in the same kernel)."""
    b = pl.program_id(0)
    ctx = ctx_len_ref[b]
    layer = layer_ref[0]
    num_pages = jax.lax.div(ctx + page_size - 1, page_size)
    pos = ctx - 1                      # write position of the new token
    wr_page = jax.lax.div(pos, page_size)
    wr_slot = jax.lax.rem(pos, page_size)
    phys_w = page_tables_ref[b, wr_page]

    # quantize/pack (or cast) the new K/V into a pool-dtype VMEM staging
    # buf, then DMA it into the pool row
    kq_buf[:] = _quant_pack(kn_ref[0].astype(jnp.float32), qp_ref[0],
                            qp_ref[1], kv_bits, k_out.dtype)
    vq_buf[:] = _quant_pack(vn_ref[0].astype(jnp.float32), qp_ref[2],
                            qp_ref[3], kv_bits, v_out.dtype)
    # masked slots (retired/empty, valid=0) must NOT write — their page
    # rows may belong to other sequences (the XLA scatter drops these
    # via the valid mask; same contract here)
    @pl.when(valid_ref[b] != 0)
    def _store():
        wk = pltpu.make_async_copy(kq_buf,
                                   k_out.at[layer, phys_w, wr_slot],
                                   wsem.at[0])
        wv = pltpu.make_async_copy(vq_buf,
                                   v_out.at[layer, phys_w, wr_slot],
                                   wsem.at[1])
        wk.start()
        wv.start()
        # the attention below reads the page holding the new token — the
        # store must land first (tiny [KH, Dh] copy; negligible latency)
        wk.wait()
        wv.wait()

    q = q_ref[0].astype(jnp.float32) * scale             # [KH*G, Dh]
    out = _online_attend(b, ctx, layer, q, page_tables_ref, k_out, v_out,
                         k_buf, v_buf, sem, qp_ref, page_size=page_size,
                         kh=kh, g=g, dh=dh, kv_bits=kv_bits)
    o_ref[0] = out.astype(o_ref.dtype)


def _rope_full(x, cos_f, sin_f, half: int):
    """Rotate-half rope on [H, Dh] rows with FULL-width [Dh] tables:
    rope(x) = x * cos_f + rothalf(x) * sin_f where cos_f = (cos|cos|1…)
    and sin_f = (-sin|sin|0…) — the tail past 2*half (partial-rotary
    models) rides through untouched because cos=1/sin=0 there, and the
    rotated partner concat keeps every op full-lane-width friendly."""
    x = x.astype(jnp.float32)
    x1 = x[:, :half]
    x2 = x[:, half:2 * half]
    rh = jnp.concatenate([x2, x1], axis=-1)
    if x.shape[-1] > 2 * half:
        rh = jnp.concatenate([rh, x[:, 2 * half:]], axis=-1)
    return x * cos_f[None, :] + rh * sin_f[None, :]


def _decode_rope_write_kernel(page_tables_ref, ctx_len_ref, layer_ref,
                              valid_ref,                       # prefetch
                              q_ref, kn_ref, vn_ref, cos_ref, sin_ref,
                              k_in, v_in, qp_ref, qs_ref,
                              k_out, v_out, o_ref,
                              kq_buf, vq_buf, k_buf, v_buf, sem, wsem,
                              *, page_size: int, kh: int, g: int, dh: int,
                              half: int, kv_bits: int, scale: float):
    """Fully fused decode attention layer: rope(q,k) + KV-append +
    paged attend in ONE kernel — the reference mmha applies rope at
    cuh:1381-1401, stores at cuh:1434 and attends, all in one kernel;
    this is the complete TPU equivalent (the unfused path leaves rope
    to XLA between the qkv matmul and the attention kernel, costing a
    per-layer fusion boundary on tiny [B,H,Dh] tensors)."""
    b = pl.program_id(0)
    ctx = ctx_len_ref[b]
    layer = layer_ref[0]
    pos = ctx - 1                      # write position of the new token
    wr_page = jax.lax.div(pos, page_size)
    wr_slot = jax.lax.rem(pos, page_size)
    phys_w = page_tables_ref[b, wr_page]

    cos_f = cos_ref[0, 0]                                 # [Dh] f32
    sin_f = sin_ref[0, 0]
    k_rot = _rope_full(kn_ref[0], cos_f, sin_f, half)     # [KH, Dh] f32

    kq_buf[:] = _quant_pack(k_rot, qp_ref[0], qp_ref[1], kv_bits,
                            k_out.dtype)
    vq_buf[:] = _quant_pack(vn_ref[0].astype(jnp.float32), qp_ref[2],
                            qp_ref[3], kv_bits, v_out.dtype)

    @pl.when(valid_ref[b] != 0)
    def _store():
        wk = pltpu.make_async_copy(kq_buf,
                                   k_out.at[layer, phys_w, wr_slot],
                                   wsem.at[0])
        wv = pltpu.make_async_copy(vq_buf,
                                   v_out.at[layer, phys_w, wr_slot],
                                   wsem.at[1])
        wk.start()
        wv.start()
        wk.wait()
        wv.wait()

    # logn attention scaling rides the per-slot q scale (qs_ref); 1.0
    # for models without it
    q = _rope_full(q_ref[0], cos_f, sin_f, half) * (scale * qs_ref[b])
    out = _online_attend(b, ctx, layer, q, page_tables_ref, k_out, v_out,
                         k_buf, v_buf, sem, qp_ref, page_size=page_size,
                         kh=kh, g=g, dh=dh, kv_bits=kv_bits)
    o_ref[0] = out.astype(o_ref.dtype)


def paged_decode_attention_write(q, k_new, v_new, k_cache, v_cache, layer,
                                 page_table, context_len, valid,
                                 qparams4, *,
                                 quantized: bool, interpret: bool = False):
    """Fused decode step: append k_new/v_new at position context_len-1
    (with in-kernel INT8 quant when the pool is int8), then attend.

    Args are as in :func:`paged_decode_attention` plus
    k_new/v_new: [B, KH, Dh] this step's rope'd key/value.
    The pool buffers are ALIASED in place (donated) — returns
    (k_cache, v_cache, out [B, KH*G, Dh]).

    ``valid`` [B] gates the store per slot (masked slots attend over
    garbage and produce discarded output, like the plain kernel, but
    never write).
    """
    b, h, dh = q.shape
    kh = k_cache.shape[-2]
    g = h // kh
    page_size = k_cache.shape[-3]
    dp = k_cache.shape[-1]           # pool feature width (Dh/2 for int4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kh, dp), k_cache.dtype),
            pltpu.VMEM((kh, dp), v_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), k_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_write_kernel, page_size=page_size, kh=kh, g=g, dh=dh,
        kv_bits=kv_bits_of(k_cache.dtype, quantized), scale=dh ** -0.5)
    # inputs (after the 4 scalar-prefetch args): q, k_new, v_new,
    # k_cache, v_cache, qp -> alias pool inputs onto outputs 0/1
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        ],
        input_output_aliases={7: 0, 8: 1},
        interpret=interpret,
    )(jnp.maximum(page_table, 0), context_len,
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      valid.astype(jnp.int32), q, k_new, v_new,
      k_cache, v_cache, jnp.asarray(qparams4, jnp.float32))


def rope_full_tables(cos: jnp.ndarray, sin: jnp.ndarray, dh: int):
    """Expand [B, half] rope tables to the full-width [B, Dh] form the
    fused kernel consumes: cos_f = (cos|cos|1…), sin_f = (-sin|sin|0…)
    (sign folded in so the kernel's rotated-partner concat needs no
    negate).  Built ONCE per step outside the layer scan."""
    b, half = cos.shape
    tail = dh - 2 * half
    cos_f = jnp.concatenate([cos, cos], axis=-1).astype(jnp.float32)
    sin_f = jnp.concatenate([-sin, sin], axis=-1).astype(jnp.float32)
    if tail:
        cos_f = jnp.concatenate(
            [cos_f, jnp.ones((b, tail), jnp.float32)], axis=-1)
        sin_f = jnp.concatenate(
            [sin_f, jnp.zeros((b, tail), jnp.float32)], axis=-1)
    return cos_f, sin_f


def paged_decode_attention_rope_write(q, k_new, v_new, cos_f, sin_f,
                                      qscale, k_cache, v_cache, layer,
                                      page_table, context_len, valid,
                                      qparams4, *, half: int,
                                      quantized: bool,
                                      interpret: bool = False):
    """Fully fused decode layer attention: in-kernel rope on q/k_new,
    append at position context_len-1 (INT8 quant when the pool is int8),
    then paged attend.  Args as :func:`paged_decode_attention_write`
    except q/k_new arrive UNROTATED and:

      cos_f/sin_f: f32 [B, Dh] full-width tables from
        :func:`rope_full_tables` (position-only, built once per step).
      qscale: f32 [B] extra per-slot q multiplier (logn attention
        scaling; ones when unused).
      half: static rotary_dim // 2.
    """
    b, h, dh = q.shape
    kh = k_cache.shape[-2]
    g = h // kh
    page_size = k_cache.shape[-3]
    dp = k_cache.shape[-1]           # pool feature width (Dh/2 for int4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kh, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            # [B, 1, Dh] with block (1, 1, dh): the unit sublane dim
            # satisfies Mosaic's block-mapping rule ((1, dh) on [B, dh]
            # does not — chip-verified lowering error)
            pl.BlockSpec((1, 1, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((kh, dp), k_cache.dtype),
            pltpu.VMEM((kh, dp), v_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), k_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _decode_rope_write_kernel, page_size=page_size, kh=kh, g=g, dh=dh,
        half=half, kv_bits=kv_bits_of(k_cache.dtype, quantized),
        scale=dh ** -0.5)
    # inputs (after the 4 prefetch args): q, k_new, v_new, cos_f, sin_f,
    # k_cache, v_cache, qp, qs -> alias pool inputs onto outputs 0/1
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        ],
        input_output_aliases={9: 0, 10: 1},
        interpret=interpret,
    )(jnp.maximum(page_table, 0), context_len,
      jnp.reshape(layer, (1,)).astype(jnp.int32),
      valid.astype(jnp.int32), q, k_new, v_new,
      cos_f[:, None, :], sin_f[:, None, :],
      k_cache, v_cache, jnp.asarray(qparams4, jnp.float32),
      qscale.astype(jnp.float32))


def paged_decode_attention(q, k_cache, v_cache, layer, page_table,
                           context_len, qparams4, *, quantized: bool,
                           interpret: bool = False):
    """Decode-step attention over the paged pool, one layer.

    Args:
      q: [B, KH*G, Dh] current-token queries, rope already applied, q heads
        grouped kv-major (head h belongs to kv head h // G).
      k_cache/v_cache: FULL pool [L, P, page, KH, Dh] (bf16 or int8).
      layer: int32 scalar — which layer to attend in.
      page_table: int32 [B, max_pages] (-1 = unmapped; never dereferenced
        past context_len).
      context_len: int32 [B] valid context INCLUDING the current token,
        whose K/V must already be written.
      qparams4: f32 [4] = (k_scale, k_zp, v_scale, v_zp) for this layer.
      quantized: static — whether the pool is int8.
    Returns [B, KH*G, Dh] in q.dtype.
    """
    b, h, dh = q.shape
    kh = k_cache.shape[-2]
    g = h // kh
    page_size = k_cache.shape[-3]
    dp = k_cache.shape[-1]           # pool feature width (Dh/2 for int4)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, h, dh), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, page_size, kh, dp), k_cache.dtype),
            pltpu.VMEM((2, page_size, kh, dp), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, page_size=page_size, kh=kh, g=g, dh=dh,
        kv_bits=kv_bits_of(k_cache.dtype, quantized), scale=dh ** -0.5)

    def kern(pt, cl, lyr, q_ref, k_hbm, v_hbm, qp_ref, o_ref,
             k_buf, v_buf, sem):
        kernel(pt, cl, lyr, q_ref.at[0], k_hbm, v_hbm, qp_ref, o_ref.at[0],
               k_buf, v_buf, sem)

    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h, dh), q.dtype),
        interpret=interpret,
    )(jnp.maximum(page_table, 0), context_len,
      jnp.reshape(layer, (1,)).astype(jnp.int32), q, k_cache, v_cache,
      jnp.asarray(qparams4, jnp.float32))


__all__ = ['paged_decode_attention', 'paged_decode_attention_write',
           'paged_decode_attention_rope_write', 'rope_full_tables']
