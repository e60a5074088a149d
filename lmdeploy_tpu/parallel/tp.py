"""Tensor parallelism over a TPU device mesh.

TPU-native rebuild of the reference's NCCL tensor parallelism
(SURVEY.md §2.3: column-split QKV/gate/up + row-split O/down with
all-reduce after attn-out and ffn-down, LlamaContextAttentionLayer.cc:
244-248; vocab-split lm_head + all-gather, LlamaV2.cc:338-369; KV heads
split, LlamaV2.cc:111).  Instead of one host thread + one NCCL rank per
device, ONE jitted SPMD program spans the mesh: ``jax.shard_map`` gives
each shard its local weight blocks and the model inserts ``psum`` /
``all_gather`` exactly where the reference places NCCL calls — XLA's
latency-hiding scheduler overlaps the ICI collectives with compute.

Weight layout work the reference does offline per rank (deploy.py
merge_qkv:251, tp_m_s4:668 — interleaved per-rank files) happens here at
load time as a host-side column permutation / int4 repack, so workspaces
stay TP-agnostic.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ModelConfig
from ..ops.linear import QuantizedWeight

TP_AXIS = 'tp'
DP_AXIS = 'dp'


def make_mesh(tp: int, dp: int = 1, devices=None) -> Mesh:
    """Build a (dp, tp) mesh; tp rides the fastest-varying (ICI-adjacent)
    axis so TP collectives stay on-chip interconnect.  Devices order
    host-major so each dp row is one host's devices on a multi-host pod
    (dp groups then never send decode traffic over DCN)."""
    if devices is None:
        devices = sorted(jax.devices(),
                         key=lambda d: (d.process_index, d.id))
    n = dp * tp
    if len(devices) < n:
        raise ValueError(f'need {n} devices, have {len(devices)}')
    arr = np.asarray(devices[:n]).reshape(dp, tp)
    return Mesh(arr, (DP_AXIS, TP_AXIS))


# ---------------------------------------------------------------------------
# host-side weight preparation (load-time equivalent of deploy.py's per-rank
# interleave)
# ---------------------------------------------------------------------------

def _qkv_column_perm(cfg: ModelConfig, tp: int) -> np.ndarray:
    """Permutation of the fused-QKV output dim from [Q|K|V] global layout to
    concat-per-rank [q_r|k_r|v_r] so a plain contiguous shard of the last
    dim hands every rank its own q/k/v block (reference: merge_qkv)."""
    h, kh, dh = cfg.head_num, cfg.kv_head_num, cfg.size_per_head
    assert h % tp == 0 and kh % tp == 0, (h, kh, tp)
    q_cols = np.arange(h * dh).reshape(tp, h // tp * dh)
    k_cols = h * dh + np.arange(kh * dh).reshape(tp, kh // tp * dh)
    v_cols = (h + kh) * dh + np.arange(kh * dh).reshape(tp, kh // tp * dh)
    return np.concatenate([q_cols, k_cols, v_cols], axis=1).reshape(-1)


def _permute_cols(arr: np.ndarray, perm: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(arr[..., perm])


def _perm_colsplit_int4(qw: QuantizedWeight, perm: np.ndarray
                        ) -> QuantizedWeight:
    """Apply an N-permutation to a byte-per-value int4 weight.  Row-
    parallel (K-split) int4 weights need NO repack — the K dim shards
    contiguously."""
    return QuantizedWeight(
        qvals=jnp.asarray(_permute_cols(np.asarray(qw.qvals), perm)),
        scales=jnp.asarray(_permute_cols(np.asarray(qw.scales), perm)),
        zeros=jnp.asarray(_permute_cols(np.asarray(qw.zeros), perm)))


def _pad_axis(arr, axis: int, count: int, value):
    if count == 0:
        return arr
    arr = np.asarray(arr)
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, count)
    return np.pad(arr, pad, constant_values=value)


def _pad_quant_cols(qw: QuantizedWeight, count: int) -> QuantizedWeight:
    """Pad the N (output) dim of an int4 weight with exact-zero columns:
    q=0, zero-point 0, scale 1 -> dequant (0-0)*1 = 0."""
    return QuantizedWeight(
        qvals=jnp.asarray(_pad_axis(qw.qvals, -1, count, 0)),
        scales=jnp.asarray(_pad_axis(qw.scales, -1, count, 1)),
        zeros=jnp.asarray(_pad_axis(qw.zeros, -1, count, 0)))


def _pad_quant_rows(qw: QuantizedWeight, count: int) -> QuantizedWeight:
    """Pad the K (input) dim of an int4 weight with whole zero groups."""
    group = qw.group_size
    assert count % group == 0, (count, group)
    return QuantizedWeight(
        qvals=jnp.asarray(_pad_axis(qw.qvals, -2, count, 0)),
        scales=jnp.asarray(_pad_axis(qw.scales, -2, count // group, 1)),
        zeros=jnp.asarray(_pad_axis(qw.zeros, -2, count // group, 0)))


def _pad_inter_for_tp(layers: Dict[str, Any], tp: int,
                      mult: int = 1) -> Dict[str, Any]:
    """Row-parallel int4 w2 shards K (= inter_size) over tp with its
    per-group scales [L, K/group, N] sharded on the group dim — each rank
    must own whole groups, i.e. inter_size % (group*tp) == 0.  Llama-2-7B
    (inter 11008, group 128 -> 86 groups) breaks this at tp=4/8, so pad
    inter_size up to the next group*tp multiple with exact-zero columns in
    w1/w3 and zero rows in w2 (the reference instead pre-splits per-rank
    files offline and requires divisibility, deploy.py tp_m_s4)."""
    w2 = layers['w2']
    if not isinstance(w2, QuantizedWeight):
        return layers
    group = w2.group_size
    inter = w2.k
    quantum = group * tp * mult
    pad = (-inter) % quantum
    if pad == 0:
        return layers
    layers = dict(layers)
    layers['w2'] = _pad_quant_rows(w2, pad)
    for name in ('w1', 'w3'):
        w = layers[name]
        if isinstance(w, QuantizedWeight):
            layers[name] = _pad_quant_cols(w, pad)
        else:
            layers[name] = jnp.asarray(_pad_axis(w, -1, pad, 0))
    return layers


def prepare_params_for_tp(params: Dict[str, Any], cfg: ModelConfig,
                          tp: int) -> Dict[str, Any]:
    """Reorder/repack weights so contiguous TP shards are rank-correct.

    - wqkv / bqkv: column permutation to per-rank [q_r|k_r|v_r].
    - int4 w1/w3/w2: inter_size padded to a group*tp multiple so row-
      parallel quant groups never straddle ranks (see _pad_inter_for_tp).
    - tied embeddings: materialize an explicit lm_head so the vocab-split
      logits all-gather is uniform.
    Everything else shards contiguously as-is.
    """
    if tp == 1:
        return params
    perm = _qkv_column_perm(cfg, tp)
    layers = _pad_inter_for_tp(dict(params['layers']), tp)
    # row-parallel int4 wo: K = head_num*size_per_head; every head is
    # whole groups when size_per_head % group == 0 (128/128 for llama),
    # otherwise sharding would split a quant group across ranks.
    wo = layers.get('wo')
    if isinstance(wo, QuantizedWeight):
        assert wo.k % (wo.group_size * tp) == 0, (
            f'wo K={wo.k} not divisible by group*tp='
            f'{wo.group_size * tp}; quant groups would straddle TP ranks')
    wqkv = layers['wqkv']
    if isinstance(wqkv, QuantizedWeight):
        layers['wqkv'] = _perm_colsplit_int4(wqkv, perm)
    else:
        layers['wqkv'] = jnp.asarray(_permute_cols(np.asarray(wqkv), perm))
    if 'bqkv' in layers:
        layers['bqkv'] = jnp.asarray(
            _permute_cols(np.asarray(layers['bqkv']), perm))
    out = dict(params)
    out['layers'] = layers
    if 'lm_head' not in out:
        emb = np.asarray(params['tok_embedding'])
        out['lm_head'] = jnp.asarray(np.ascontiguousarray(emb.T))
    vp = out['lm_head'].shape[-1]
    assert vp % tp == 0, f'padded vocab {vp} not divisible by tp={tp}'
    return out


def pack_params_for_tp(params: Dict[str, Any], tp: int) -> Dict[str, Any]:
    """Nibble-pack the int4 layers (true sub-byte residency) so every
    contiguous tp shard of the packed array is a correctly HALF-SPLIT
    packed local block (ops/pallas/quant_matmul.pack_nibbles puts rows
    [0, K/2) in the low nibble and [K/2, K) in the high nibble — a
    K-sharded globally-packed array would pair rows across ranks).

    Column-split weights (wqkv/w1/w3: K unsharded) pack globally;
    row-split (wo/w2) pack each rank's K block independently and
    concatenate, so the shard boundary IS the pack boundary.  Run AFTER
    :func:`prepare_params_for_tp` (which validates group alignment on
    the byte-per-int4 form)."""
    from ..ops.linear import PackedInt4Weight
    from ..ops.pallas.quant_matmul import pack_nibbles
    layers = dict(params['layers'])
    # the packed kernel half-splits each rank's K, so the per-rank group
    # count must be EVEN: widen the inter padding quantum to 2*group*tp
    # (idempotent on top of prepare_params_for_tp's group*tp padding)
    layers = _pad_inter_for_tp(layers, tp, mult=2)
    from ..models.llama import packable
    for name, w in list(layers.items()):
        if not isinstance(w, QuantizedWeight):
            continue
        if not packable(w):
            # unpackable shape (odd group count / unaligned N): stay on
            # byte-per-int4 for this weight — mixed residency is fine,
            # the forward dispatches per-weight
            continue
        # keep device-resident qvals ON DEVICE (pack_nibbles dispatches;
        # np.asarray would drag the full 7B qvals through the chip
        # tunnel at startup)
        q = w.qvals if isinstance(w.qvals, jax.Array) \
            else np.asarray(w.qvals, np.uint8)     # [L, K, N]
        xp = jnp if isinstance(q, jax.Array) else np
        if name in _ROW_SPLIT and tp > 1:
            per_rank_groups = w.k // (w.group_size * tp)
            if per_rank_groups % 2:
                # packed residency is a perf default, not a contract:
                # fall back to byte-per-int4 rather than failing the
                # engine on a shape the half-split can't shard
                continue
            blocks = xp.split(q, tp, axis=-2)
            packed = xp.concatenate([pack_nibbles(b) for b in blocks],
                                    axis=-2)
        else:
            packed = pack_nibbles(q)
        s = jnp.asarray(w.scales)
        z = jnp.asarray(w.zeros)
        layers[name] = PackedInt4Weight(
            packed=jnp.asarray(packed), scales=s[:, :, None, :],
            sz=(s.astype(jnp.float32)
                * z.astype(jnp.float32)).astype(s.dtype))
    out = dict(params)
    out['layers'] = layers
    return out


# ---------------------------------------------------------------------------
# partition specs
# ---------------------------------------------------------------------------

# Column-parallel (output dim sharded) / row-parallel (input dim sharded)
# assignment per weight family, mirroring §2.3's table.
_COL_SPLIT = {'wqkv', 'w1', 'w3'}
_ROW_SPLIT = {'wo', 'w2'}


def param_pspecs(params: Dict[str, Any], axis: str = TP_AXIS):
    """PartitionSpec pytree matching ``params`` (post prepare_params_for_tp).

    Layer weights are stacked [L, K, N]: column-split shards N, row-split
    shards K.  QuantizedWeight shards its packed/scales/zeros consistently
    (their K-like dims are K/2 and K/group).
    """
    def spec(path, leaf):
        names = [getattr(k, 'key', getattr(k, 'name', '')) for k in path]
        field = names[-1]
        wname = next((n for n in names if n in _COL_SPLIT | _ROW_SPLIT
                      or n in ('bqkv', 'bo', 'lm_head', 'tok_embedding')),
                     None)
        ndim = np.ndim(leaf)
        if wname == 'lm_head':
            return P(None, axis)                      # [D, Vp] vocab-split
        if wname == 'tok_embedding':
            return P()                                # replicated lookup
        if wname == 'bqkv':
            return P(None, axis)                      # [L, (h+2kh)dh]
        if wname in _COL_SPLIT:
            return P(*([None] * (ndim - 1)), axis)    # shard last (N-like)
        if wname in _ROW_SPLIT:
            # K-like dim (K rows, K/2 packed rows, K/group scale groups)
            # is dim 1; packed scales carry a trailing unit sublane dim
            # ([L, G, 1, N]) so pad the spec to the leaf's rank
            return P(None, axis, *([None] * (ndim - 2)))
        return P()                                    # norms, bo: replicated
    return jax.tree_util.tree_map_with_path(spec, params)


def cache_pspecs(axis: str = TP_AXIS, dp_axis: Optional[str] = None,
                 per_head_scales: bool = False,
                 token_scales: bool = False):
    """KVCache spec: KV heads sharded over tp (reference: LlamaV2.cc:111);
    with ``dp_axis`` the page-pool dim additionally shards over dp — each
    dp group owns an independent pool addressed by pool-local page ids.
    ``per_head_scales``: qparams are [L, KH] (int4 pools) and their head
    dim shards with the KV heads.  ``token_scales``: dynamic per-token
    qparam pools [L, P, page, KH] shard like the payload pool."""
    from ..kvcache.paged import KVCache
    if token_scales:
        s = P(None, dp_axis, None, axis)
    elif per_head_scales:
        s = P(None, axis)
    else:
        s = P()
    return KVCache(k=P(None, dp_axis, None, axis, None),
                   v=P(None, dp_axis, None, axis, None),
                   k_scale=s, k_zp=s, v_scale=s, v_zp=s)


def shard_tree(tree, pspecs, mesh: Mesh):
    """device_put every leaf with its NamedSharding."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, pspecs)


def replicate_tree(tree, mesh: Mesh):
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


# ---------------------------------------------------------------------------
# sharded step functions
# ---------------------------------------------------------------------------

class ShardedStepFns:
    """Drop-in replacement for engine.step.CompiledStepFns running the hot
    functions as ONE SPMD program over the mesh via jax.shard_map.

    State / batch inputs are replicated; params and the KV pool are sharded
    per §2.3; sampling runs identically on every shard from the gathered
    logits so outputs stay replicated without extra collectives.
    """

    def __init__(self, cfg: ModelConfig, mesh: Mesh, *,
                 use_pallas_attn: bool = False, dp_shard_batch: bool = False,
                 per_head_kv_scales: bool = False,
                 token_kv_scales: bool = False):
        """With ``dp_shard_batch`` the batch dim of decode state AND the
        page-pool dim of the KV cache shard over the 'dp' mesh axis — each
        dp group runs an independent continuous batch with its own page
        pool (the multi-host scale-out design, SURVEY.md §7 step 9);
        page-table entries are pool-local so no cross-dp traffic exists.
        Prefill routes to the slot's owning group inside the program
        (masked on the other shards); the logits/PPL path is pinned to
        group 0 (scratch pages come from group 0's pool).
        ``per_head_kv_scales``: [L, KH] int4-pool qparams sharded with
        the KV heads."""
        from ..engine import step as _step

        self.cfg = cfg
        self.mesh = mesh
        self.dp = int(mesh.shape.get(DP_AXIS, 1)) if dp_shard_batch else 1
        dp_axis = DP_AXIS if dp_shard_batch else None

        if dp_shard_batch:
            pspecs_cache = cache_pspecs(dp_axis=DP_AXIS,
                                        per_head_scales=per_head_kv_scales,
                                        token_scales=token_kv_scales)
            rep = P(DP_AXIS)   # batch-leading state/batch tensors
            # decode_steps packs outputs batch-LAST: [5, k, B] / [k, B]
            packed_spec = P(None, None, DP_AXIS)
            lp_spec = P(None, DP_AXIS)
        else:
            pspecs_cache = cache_pspecs(per_head_scales=per_head_kv_scales,
                                        token_scales=token_kv_scales)
            rep = P()
            packed_spec = P()
            lp_spec = P()
        self.state_spec = rep

        def smap(fn, in_specs, out_specs):
            return jax.shard_map(fn, mesh=mesh, in_specs=in_specs,
                                 out_specs=out_specs, check_vma=False)

        # decode_step(params, cache, state) -> (cache, state, tok, fin, lp)
        def make_decode(params_spec):
            fn = partial(_step.decode_step, cfg=cfg, axis=TP_AXIS,
                         use_pallas_attn=use_pallas_attn)
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, rep),
                     out_specs=(pspecs_cache, rep, rep, rep, rep)),
                donate_argnums=(1, 2))

        def make_decode_steps(params_spec, num_steps,
                              sampling_mode='candidates', topn=0):
            fn = partial(_step.decode_steps, cfg=cfg, axis=TP_AXIS,
                         num_steps=num_steps,
                         use_pallas_attn=use_pallas_attn,
                         sampling_mode=sampling_mode, topn=topn)
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, rep),
                     out_specs=(pspecs_cache, rep, packed_spec, lp_spec)),
                donate_argnums=(1, 2))
        self._make_decode_steps = make_decode_steps
        self._decode_steps_cache = {}

        def make_spec_rounds(params_spec, num_rounds, k_draft, ngram,
                             ngram_min=0, sampling='greedy', topn=0):
            fn = partial(_step.spec_decode_rounds, cfg=cfg, axis=TP_AXIS,
                         num_rounds=num_rounds, k_draft=k_draft,
                         ngram=ngram, ngram_min=ngram_min,
                         use_pallas_attn=use_pallas_attn,
                         sampling=sampling, topn=topn)
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, rep),
                     out_specs=(pspecs_cache, rep, packed_spec)),
                donate_argnums=(1, 2))
        self._make_spec_rounds = make_spec_rounds
        self._spec_rounds_cache = {}

        def make_prefill(params_spec):
            fn = partial(_step.prefill_chunk, cfg=cfg, axis=TP_AXIS,
                         use_pallas_attn=use_pallas_attn, dp_axis=dp_axis)
            # last-valid logits are per-group garbage on non-owner shards;
            # the engine prefill path discards them, so emit the owner-
            # stacked axis rather than pretending replication
            logits_spec = P(DP_AXIS) if dp_shard_batch else P()
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, rep, P(), P(),
                                   P(), P()),
                     out_specs=(pspecs_cache, logits_spec)),
                donate_argnums=(1,))

        def make_prefills(params_spec):
            fn = partial(_step.prefill_chunks, cfg=cfg, axis=TP_AXIS,
                         use_pallas_attn=use_pallas_attn, dp_axis=dp_axis)
            logits_spec = P(None, DP_AXIS) if dp_shard_batch else P()
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, rep, P(), P(),
                                   P(), P()),
                     out_specs=(pspecs_cache, logits_spec)),
                donate_argnums=(1,))

        def make_prefill_logits(params_spec):
            fn = partial(_step.prefill_logits, cfg=cfg, axis=TP_AXIS,
                         dp_axis=dp_axis)
            return jax.jit(
                smap(fn, in_specs=(params_spec, pspecs_cache, P(), P(), P(),
                                   P()),
                     out_specs=(pspecs_cache, P())),
                donate_argnums=(1,))

        self._make = (make_decode, make_prefill, make_prefill_logits,
                      make_prefills)
        self._built = None

        # state surgery stays plain jit over the (possibly dp-sharded)
        # state; GSPMD partitions the tiny index updates in place
        self.install_slot = jax.jit(_step.install_slot, donate_argnums=(0,))
        self.clear_slot = jax.jit(_step.clear_slot, donate_argnums=(0,))
        self.set_finished = jax.jit(_step.set_finished, donate_argnums=(0,))
        self.set_active = jax.jit(_step.set_active, donate_argnums=(0,))
        self.set_page_row = jax.jit(_step.set_page_row, donate_argnums=(0,))

    def _build(self, params):
        if self._built is None:
            spec = param_pspecs(params)
            mk_d, mk_p, mk_pl, mk_ps = self._make
            self._built = (mk_d(spec), mk_p(spec), mk_pl(spec), mk_ps(spec))
        return self._built

    def decode_step(self, params, cache, state):
        return self._build(params)[0](params, cache, state)

    def prefill_chunks(self, params, cache, state, slots, ids, start_pos,
                       lengths):
        return self._build(params)[3](params, cache, state, slots, ids,
                                      start_pos, lengths)

    def spec_decode_rounds(self, params, cache, state, num_rounds: int,
                           k_draft: int, ngram: int = 3,
                           ngram_min: int = 0, sampling: str = 'greedy',
                           topn: int = 0):
        key = (num_rounds, k_draft, ngram, ngram_min, sampling, topn)
        fn = self._spec_rounds_cache.get(key)
        if fn is None:
            fn = self._make_spec_rounds(param_pspecs(params), *key)
            self._spec_rounds_cache[key] = fn
        return fn(params, cache, state)

    def decode_steps(self, params, cache, state, num_steps: int,
                     sampling_mode: str = 'candidates', topn: int = 0):
        key = (num_steps, sampling_mode, topn)
        fn = self._decode_steps_cache.get(key)
        if fn is None:
            fn = self._make_decode_steps(param_pspecs(params), num_steps,
                                         sampling_mode, topn)
            self._decode_steps_cache[key] = fn
        return fn(params, cache, state)

    def prefill_chunk(self, params, cache, state, slot, ids, start_pos,
                      length):
        return self._build(params)[1](params, cache, state, slot, ids,
                                      start_pos, length)

    def prefill_logits_row(self, params, cache, page_row, ids, start_pos,
                           length):
        return self._build(params)[2](params, cache, page_row, ids,
                                      start_pos, length)


__all__ = ['make_mesh', 'prepare_params_for_tp', 'param_pspecs',
           'cache_pspecs', 'shard_tree', 'replicate_tree', 'ShardedStepFns',
           'TP_AXIS', 'DP_AXIS']
