"""Paged KV cache — device-side structures and pure update/gather functions.

TPU-native redesign of the reference's LlamaCacheManager per-sequence CUDA
slabs (src/turbomind/models/llama/LlamaCacheManager.cc): instead of one
contiguous [L,H,S,D] slab per sequence, all KV lives in a single sharded
pool ``[L, P, page_size, KH, Dh]`` addressed through a per-slot page table.
Pages give us the same pointer-indirection trick the reference's attention
kernels use (k_cache_per_sample), but with page-granular allocation, LRU
eviction and prefix reuse handled by a host-side allocator
(kvcache/manager.py).

Supports bf16, int8 and int4 storage.  INT8 follows the reference's
KV-INT8 scheme (quant_policy=4, docs/en/kv_int8.md): static per-layer
qparams from calibration, symmetric (zp=0) or asymmetric.  INT4
(beyond-reference, quant_policy=8) packs two q-domain int4 values per
byte along the head dim — pool dtype uint8 with last dim Dh/2, doubling
KV capacity vs int8.  Two int4 qparam schemes:

- DYNAMIC per-token-head-group (default, no calibration needed): each
  written token's K (and V) vector splits into G contiguous feature
  groups (LMDEPLOY_TPU_KV_DYN_GROUPS, default 2 -> 64 features per
  group at Dh=128, aligned with the nibble half-split) and each group
  gets its own asymmetric (scale, min) pair computed at append time,
  stored in parallel f32 pools [L, P, page_size, KH, G].  Grouping
  along Dh isolates outlier channels: one hot channel inflates only
  its group's scale instead of the whole vector's — measured proxy
  Δppl +0.0298 (G=1) -> -0.0181 (G=2) -> -0.0179 (G=4) vs +0.0935
  static per-layer and +0.0052 int8 (.r4/kv_ppl_groups.log, trained
  proxy): grouped dynamic int4 sits at NOISE level around bf16.  G=2
  is the default (G=4 measures the same but doubles the qparam bytes);
  overhead at G=2 is 4 f32 per 64-byte payload (25%): 0.625
  bytes/feature total vs int8's 1.0.
- STATIC per-layer / per-head qparams from calibration (kv_qparams
  --kv-bits 4), q-domain zp, clip [-8, 7] — used when a workspace
  carries calibrated int4 scales.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    """Device KV pool. k/v: [L, P, page_size, KH, Dh] (bf16 or int8), or
    [L, P, page_size, KH, Dh/2] uint8 for nibble-packed int4.

    k_scale/k_zp/v_scale/v_zp: f32 quantization parameters —
    [L] per-layer (int8 pools, reference parity), [L, KH] per-head
    (int4 pools, kv_qparams --per-head), or [L, P, page_size, KH, G]
    DYNAMIC per-token-head-group pools (int4 default: scale + f-domain
    min per contiguous Dh/G feature group, written alongside each
    token) — ignored for bf16 storage.  Static
    variants are exported by lite/kv_qparams from calibration like the
    reference's past_kv_scale.{rank}.weight files.  NOTE:
    quantize_kv/dequantize_kv take PER-LAYER SLICES of the static
    arrays (a scalar, or [KH] for per-head), never the full [L]/[L, KH]
    array.
    """
    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray
    k_zp: jnp.ndarray
    v_scale: jnp.ndarray
    v_zp: jnp.ndarray

    @property
    def dynamic_scales(self) -> bool:
        """Per-token-head-group dynamic int4 qparam pools (ndim 5) vs
        static per-layer/per-head calibration arrays."""
        return self.k_scale.ndim >= 4

    @property
    def dyn_groups(self) -> int:
        """Feature groups per head vector in the dynamic qparam pools."""
        return self.k_scale.shape[-1] if self.dynamic_scales else 0

    @property
    def num_pages(self) -> int:
        return self.k.shape[1]

    @property
    def page_size(self) -> int:
        return self.k.shape[2]

    @property
    def quantized(self) -> bool:
        return self.k.dtype in (jnp.int8, jnp.uint8)

    @property
    def quant_bits(self) -> int:
        """0 (bf16), 8 (int8) or 4 (nibble-packed uint8 pool)."""
        if self.k.dtype == jnp.int8:
            return 8
        if self.k.dtype == jnp.uint8:
            return 4
        return 0


def init_cache(num_layers: int, num_pages: int, page_size: int,
               kv_heads: int, head_dim: int, dtype=jnp.bfloat16,
               kv_scales=None, shardings=None,
               dynamic_scales: bool = False) -> KVCache:
    """Allocate the pool.  With ``shardings`` (a KVCache pytree of
    NamedSharding) the arrays are created directly sharded — each device
    materializes only its own shard.  Allocating unsharded and
    device_put-ing afterwards would transiently hold the FULL pool on the
    default device (tp x the per-device HBM budget) and OOM at startup on
    real multi-chip hardware."""
    if dtype == jnp.uint8:               # nibble-packed int4: 2 per byte
        if head_dim % 2:
            raise ValueError(f'int4 KV needs even head_dim, got {head_dim}')
        head_dim = head_dim // 2
    shape = (num_layers, num_pages, page_size, kv_heads, head_dim)
    if kv_scales is None:
        scales = None
    else:
        scales = tuple(jnp.asarray(x, jnp.float32) for x in kv_scales)

    def build():
        if dynamic_scales:
            # per-token-head-group dynamic qparam pools, written by
            # write_kv_dynamic alongside the nibble payload
            pshape = (num_layers, num_pages, page_size, kv_heads,
                      kv_dyn_groups(head_dim * 2))
            ks = jnp.ones(pshape, jnp.float32)
            kz = jnp.zeros(pshape, jnp.float32)
            vs = jnp.ones(pshape, jnp.float32)
            vz = jnp.zeros(pshape, jnp.float32)
        elif scales is None:
            # NB: four distinct arrays — sharing one buffer breaks jit
            # donation
            ks = jnp.ones((num_layers,), jnp.float32)
            kz = jnp.zeros((num_layers,), jnp.float32)
            vs = jnp.ones((num_layers,), jnp.float32)
            vz = jnp.zeros((num_layers,), jnp.float32)
        else:
            ks, kz, vs, vz = scales
        return KVCache(k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
                       k_scale=ks, k_zp=kz, v_scale=vs, v_zp=vz)

    if shardings is None:
        return build()
    return jax.jit(build, out_shardings=shardings)()


def _per_head(p, x):
    """Per-layer qparams are scalars; per-head qparams arrive as [KH]
    (one layer's slice of a [L, KH] export) and must broadcast against
    x's [..., KH, Dh] trailing dims.  A non-scalar whose length is not
    x's KV-head count is a caller bug (e.g. an unsliced [L] array) —
    fail at trace time rather than mis-broadcast."""
    if getattr(p, 'ndim', 0) >= 1:
        if p.shape[-1] != x.shape[-2]:
            raise ValueError(
                f'per-head kv qparams {p.shape} do not match KV heads '
                f'{x.shape[-2]}; per-layer [L] arrays must be sliced to '
                f'scalars before quantize_kv/dequantize_kv')
        return p[..., :, None]
    return p


def quantize_kv(x: jnp.ndarray, scale, zp, bits: int = 8) -> jnp.ndarray:
    """f -> q-domain int with static scale/zp (reference: int8 store path
    of ExtendKVCache / mmha, llama_kernels.cu:342-431; bits=4 clips to
    the int4 range for the packed pool).  scale/zp: scalar (per-layer)
    or [KH] (per-head, int4 pools)."""
    q = jnp.round(x.astype(jnp.float32) / _per_head(scale, x)
                  + _per_head(zp, x))
    lo, hi = (-8, 7) if bits == 4 else (-128, 127)
    return jnp.clip(q, lo, hi).astype(jnp.int8)


def dequantize_kv(q: jnp.ndarray, scale, zp, dtype=jnp.bfloat16) -> jnp.ndarray:
    return ((q.astype(jnp.float32) - _per_head(zp, q))
            * _per_head(scale, q)).astype(dtype)


def pack_kv_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 q-domain values in [-8, 7], [..., Dh] -> uint8 [..., Dh/2].

    HALF-SPLIT layout: byte j holds feature j in the low nibble and
    feature j + Dh/2 in the high nibble — the same trick the packed-
    weight kernel uses (ops/pallas/quant_matmul.py): unpacking is two
    contiguous slices + concat, NO lane interleaving, so the Pallas
    attention kernels can unpack in-register on the TPU vector unit."""
    u = q.astype(jnp.uint8) & 0xF
    dh2 = u.shape[-1] // 2
    return u[..., :dh2] | (u[..., dh2:] << 4)


def unpack_kv_int4(p: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., Dh/2] -> sign-extended int8 [..., Dh] (half-split
    layout: low nibbles are features [0, Dh/2), high are [Dh/2, Dh))."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    lo = (lo ^ 8) - 8
    hi = (hi ^ 8) - 8
    return jnp.concatenate([lo, hi], axis=-1)


def unpack_kv_uint4(p: jnp.ndarray) -> jnp.ndarray:
    """uint8 [..., Dh/2] -> UNSIGNED int8 values 0..15, [..., Dh]
    (dynamic per-token scheme: q-domain is [0, 15], x = q*s + min)."""
    lo = (p & 0xF).astype(jnp.int8)
    hi = (p >> 4).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1)


def kv_dyn_groups(head_dim: int) -> int:
    """Feature groups per head vector for dynamic int4 qparams
    (LMDEPLOY_TPU_KV_DYN_GROUPS, default 2 -> 64-feature groups at
    Dh=128, aligned with the nibble half-split; measured Δppl table in
    the module docstring).  Clamped to a divisor of Dh/2 so groups stay
    aligned with the half-split pack."""
    import os
    g = int(os.environ.get('LMDEPLOY_TPU_KV_DYN_GROUPS', '2'))
    g = max(1, g)
    while (head_dim // 2) % g:
        g -= 1
    return g


def quantize_kv_dynamic(x: jnp.ndarray, groups: int | None = None):
    """Asymmetric per-token-head-GROUP int4: each [..., Dh] vector splits
    into ``groups`` contiguous feature groups and each group quantizes
    against its OWN (scale, min), so one outlier channel inflates only
    its group's 16-level range.  Returns (packed uint8 [..., Dh/2],
    scale [..., G], mn [..., G]) with x ~= q*scale + mn per group."""
    dh = x.shape[-1]
    g = kv_dyn_groups(dh) if groups is None else groups
    xf = x.astype(jnp.float32).reshape(*x.shape[:-1], g, dh // g)
    mn = jnp.min(xf, axis=-1)
    mx = jnp.max(xf, axis=-1)
    s = jnp.maximum((mx - mn) / 15.0, 1e-8)
    q = jnp.clip(jnp.round((xf - mn[..., None]) / s[..., None]), 0, 15)
    q = q.reshape(*x.shape[:-1], dh)
    return pack_kv_int4(q.astype(jnp.uint8)), s, mn


def write_kv(cache_k: jnp.ndarray, cache_v: jnp.ndarray, layer,
             k_new: jnp.ndarray, v_new: jnp.ndarray,
             positions: jnp.ndarray, page_table: jnp.ndarray,
             valid: jnp.ndarray, qparams=None):
    """Scatter new tokens' K/V into the FULL pool [L, P, page, KH, Dh] at
    ``layer`` — scattering into the full array (instead of slice-modify-
    writeback) lets XLA alias the update in place inside the layer loop,
    avoiding a whole-pool copy per layer."""
    p, page_size = cache_k.shape[1], cache_k.shape[2]
    page_of = positions // page_size
    slot_of = positions % page_size
    phys = jnp.take_along_axis(page_table, page_of, axis=1)
    phys = jnp.where(valid & (phys >= 0), phys, p)
    if qparams is not None:
        ks, kz, vs, vz = qparams
        if cache_k.dtype == jnp.uint8:   # nibble-packed int4 pool
            k_new = pack_kv_int4(quantize_kv(k_new, ks, kz, bits=4))
            v_new = pack_kv_int4(quantize_kv(v_new, vs, vz, bits=4))
        else:
            k_new = quantize_kv(k_new, ks, kz)
            v_new = quantize_kv(v_new, vs, vz)
    else:
        k_new = k_new.astype(cache_k.dtype)
        v_new = v_new.astype(cache_v.dtype)
    cache_k = cache_k.at[layer, phys, slot_of].set(k_new, mode='drop')
    cache_v = cache_v.at[layer, phys, slot_of].set(v_new, mode='drop')
    return cache_k, cache_v


def write_kv_dynamic(cache_k, cache_v, ks_pool, kz_pool, vs_pool, vz_pool,
                     layer, k_new, v_new, positions, page_table, valid):
    """Dynamic-int4 variant of :func:`write_kv`: quantizes each token-head
    vector against its own (scale, min) and scatters the qparams into the
    parallel [L, P, page, KH] pools at the same (page, slot) indices."""
    p, page_size = cache_k.shape[1], cache_k.shape[2]
    page_of = positions // page_size
    slot_of = positions % page_size
    phys = jnp.take_along_axis(page_table, page_of, axis=1)
    phys = jnp.where(valid & (phys >= 0), phys, p)
    g = ks_pool.shape[-1]            # groups come from the pool, not env
    kq, ks, kz = quantize_kv_dynamic(k_new, g)
    vq, vs, vz = quantize_kv_dynamic(v_new, g)
    cache_k = cache_k.at[layer, phys, slot_of].set(kq, mode='drop')
    cache_v = cache_v.at[layer, phys, slot_of].set(vq, mode='drop')
    ks_pool = ks_pool.at[layer, phys, slot_of].set(ks, mode='drop')
    kz_pool = kz_pool.at[layer, phys, slot_of].set(kz, mode='drop')
    vs_pool = vs_pool.at[layer, phys, slot_of].set(vs, mode='drop')
    vz_pool = vz_pool.at[layer, phys, slot_of].set(vz, mode='drop')
    return cache_k, cache_v, ks_pool, kz_pool, vs_pool, vz_pool


def gather_kv_layer(cache_k_l: jnp.ndarray, cache_v_l: jnp.ndarray,
                    page_table: jnp.ndarray, qparams=None,
                    dtype=jnp.bfloat16) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Materialize per-slot contiguous K/V from pages (XLA reference path;
    the Pallas kernels read pages in place instead).

    Returns k/v of shape [B, max_pages*page, KH, Dh]; unmapped pages read
    page 0's data and must be masked out by the caller via kv_len.
    """
    b, max_pages = page_table.shape
    page_size = cache_k_l.shape[1]
    idx = jnp.maximum(page_table, 0)
    k = cache_k_l[idx]  # [B, max_pages, page, KH, Dh]
    v = cache_v_l[idx]
    if cache_k_l.dtype == jnp.uint8:     # nibble-packed int4 pool
        k = unpack_kv_int4(k)
        v = unpack_kv_int4(v)
    kh, dh = k.shape[-2], k.shape[-1]
    k = k.reshape(b, max_pages * page_size, kh, dh)
    v = v.reshape(b, max_pages * page_size, kh, dh)
    if qparams is not None:
        ks, kz, vs, vz = qparams
        k = dequantize_kv(k, ks, kz, dtype)
        v = dequantize_kv(v, vs, vz, dtype)
    return k, v


def gather_kv_layer_dynamic(cache_k_l, cache_v_l, ks_l, kz_l, vs_l, vz_l,
                            page_table, dtype=jnp.bfloat16):
    """Dynamic-int4 variant of :func:`gather_kv_layer`: gathers the
    per-token qparam pools with the same page indirection and applies
    x = q*scale + min per feature group.  ks_l/... are ONE layer's
    [P, page, KH, G] slices."""
    b, max_pages = page_table.shape
    page_size = cache_k_l.shape[1]
    idx = jnp.maximum(page_table, 0)
    kq = unpack_kv_uint4(cache_k_l[idx])     # [B, mp, page, KH, Dh]
    vq = unpack_kv_uint4(cache_v_l[idx])
    g = ks_l.shape[-1]
    dh = kq.shape[-1]
    gdim = (*kq.shape[:-1], g, dh // g)      # [..., KH, G, Dh/G]
    ks = ks_l[idx][..., None]                # [B, mp, page, KH, G, 1]
    kz = kz_l[idx][..., None]
    vs = vs_l[idx][..., None]
    vz = vz_l[idx][..., None]
    k = (kq.astype(jnp.float32).reshape(gdim) * ks + kz).astype(dtype)
    v = (vq.astype(jnp.float32).reshape(gdim) * vs + vz).astype(dtype)
    kh = kq.shape[-2]
    return (k.reshape(b, max_pages * page_size, kh, dh),
            v.reshape(b, max_pages * page_size, kh, dh))


__all__ = ['KVCache', 'init_cache', 'kv_dyn_groups', 'write_kv',
           'write_kv_dynamic',
           'gather_kv_layer', 'gather_kv_layer_dynamic', 'quantize_kv',
           'quantize_kv_dynamic', 'dequantize_kv', 'pack_kv_int4',
           'unpack_kv_int4', 'unpack_kv_uint4']
