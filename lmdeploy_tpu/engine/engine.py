"""TPUEngine — the persistent-batch inference engine.

Host-side rebuild of the reference's engine stack:
- TurboMind / TurboMindInstance (lmdeploy/turbomind/turbomind.py): engine
  construction, stream_infer generator, decode() logits API.
- LlamaBatch (LlamaBatch.cc): request verification, admission sorted by
  length, chunked prefill bounded by a token budget, generation loop,
  finished-request retirement, interactive step/sequence_start/end.
- LlamaV2::internalThreadEntry: one engine thread owning the device state;
  frontends enqueue EngineRequests and read streamed EngineOutputs.

TPU-native differences: no per-GPU threads or NCCL ranks — a single
compiled SPMD program spans the mesh; the scheduler mutates fixed-shape
device state through small jitted surgery functions with buffer donation.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import EngineConfig, ModelConfig
from ..kvcache.manager import NoFreePages, PageAllocator, SequenceManager
from ..kvcache.paged import init_cache
from ..messages import (EngineOutput, EngineRequest, GenerationConfig,
                        ResponseType)
from ..models.llama import vocab_padded
from ..ops.sampling import SamplingState
from ..utils.logger import get_logger
from .step import CompiledStepFns, init_decode_state

log = get_logger()


def _bucket_for(length: int, buckets) -> int:
    for b in buckets:
        if length <= b:
            return b
    return buckets[-1]


def _all_plain_greedy(cfgs) -> bool:
    """Every running slot is plain greedy: raw argmax == the full sampling
    stack (no penalties / banned words / min-length EOS masking), so the
    ungated fast paths (greedy speculative verify, pp ring decode) stay
    token-identical to the plain path."""
    return all((g.top_k or 0) == 1 and g.repetition_penalty == 1.0
               and g.presence_penalty == 0.0
               and g.frequency_penalty == 0.0 and not g.bad_words
               and g.min_new_tokens == 0 for g in cfgs)


@dataclasses.dataclass
class _Slot:
    """Host mirror of one running batch slot."""
    request: EngineRequest
    seq: Any
    out_q: queue.Queue
    context_len: int            # host shadow of device context_len
    prompt_len: int             # tokens in history when generation started
    generated: int = 0
    emitted: int = 0
    stop_sequences: List[List[int]] = dataclasses.field(default_factory=list)
    single_stops: frozenset = frozenset()
    # single-token stops past the device stop_words capacity — matched on
    # the host each round instead of being silently dropped
    host_single_stops: frozenset = frozenset()
    holdback: int = 0           # tokens withheld while a stop prefix may grow
    prefilling: bool = False    # admitted, prompt not fully in KV yet
    tail: List[int] = dataclasses.field(default_factory=list)
    logprobs: List[float] = dataclasses.field(default_factory=list)
    # per generated token: {token_id: logprob} of the top-N alternatives
    top_lps: List[dict] = dataclasses.field(default_factory=list)
    done: bool = False
    saw_round: bool = False  # this slot appeared in >=1 decode round
    max_new: int = 0         # host shadow of sampling.max_new_tokens


class TPUEngine:
    """Owns device state + the engine thread. Thread-safe frontends attach
    via :meth:`create_instance`."""

    def __init__(self, model_cfg: ModelConfig, engine_cfg: EngineConfig,
                 params: Dict[str, Any], tokenizer=None, stop_words=None,
                 kv_scales=None, start: bool = True):
        self.cfg = model_cfg
        if engine_cfg.enable_prefix_caching and (
                model_cfg.use_dynamic_ntk
                or model_cfg.rope_scaling_type == 'dynamic'):
            # dynamic-NTK K vectors depend on the TOTAL context length at
            # prefill time, not just (tokens, positions) — cached pages
            # from one session would be wrongly rotated for another.
            log.info('prefix caching disabled: dynamic-NTK rope makes KV '
                     'pages context-length-dependent')
            engine_cfg = dataclasses.replace(
                engine_cfg, enable_prefix_caching=False)
        self.ecfg = engine_cfg
        self.params = params
        self.tokenizer = tokenizer
        self.default_stop_words = list(stop_words or [])

        b = engine_cfg.max_batch_size
        page = engine_cfg.page_size
        self.dp = max(1, engine_cfg.dp)
        if b % self.dp:
            raise ValueError(f'max_batch_size {b} not divisible by '
                             f'dp={self.dp}')
        self.b_local = b // self.dp
        self.session_len = min(engine_cfg.session_len, model_cfg.session_len) \
            if model_cfg.session_len else engine_cfg.session_len
        self.max_pages_per_seq = -(-self.session_len // page)
        num_pages = engine_cfg.num_pages or self._derive_num_pages()
        num_pages -= num_pages % self.dp  # page dim shards over dp groups
        if num_pages // self.dp < self.max_pages_per_seq:
            raise ValueError(
                f'{num_pages} pages / dp={self.dp} cannot hold one '
                f'session of {self.max_pages_per_seq} pages')
        self.num_pages = num_pages

        kv_dtype = {'int8': jnp.int8,
                    'int4': jnp.uint8}.get(engine_cfg.kv_dtype,
                                           jnp.bfloat16)
        kv_scales = kv_scales if kv_dtype != jnp.bfloat16 else None
        self._kv_dtype = kv_dtype
        self._kv_scales = kv_scales
        # per-head [L, KH] qparams: int4-pool only (the Pallas int8
        # attention kernels take per-layer scalars)
        per_head = (kv_scales is not None
                    and np.asarray(kv_scales[0]).ndim == 2)
        if per_head and kv_dtype != jnp.uint8:
            raise ValueError('per-head kv_scales require kv_dtype=int4')
        self._per_head_kv = per_head
        # int4 pool with NO calibrated qparams -> DYNAMIC per-token-head
        # scales (default; no calibration needed, ~20x better proxy ppl
        # than static per-layer scales — kvcache/paged.py)
        self._dyn_kv = kv_dtype == jnp.uint8 and kv_scales is None
        self._cache_sh = None
        self._state_sharding = None
        if engine_cfg.pp > 1:
            # Pipeline-parallel serving over a (pp, tp) mesh: layer-
            # sharded stages, generic relay forward (full sampling stack;
            # parallel/pp.py).  Beyond-reference — the reference
            # hard-disables PP (LlamaTritonModel.cc:298).
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.pp import (PPStepFns, make_mesh_3d,
                                       make_mesh_pp, pp_cache_pspecs,
                                       pp_param_pspecs,
                                       prepare_params_for_pp)
            from ..parallel.tp import (DP_AXIS, prepare_params_for_tp,
                                       shard_tree)
            if model_cfg.num_layer % engine_cfg.pp:
                raise ValueError(
                    f'num_layer {model_cfg.num_layer} not divisible by '
                    f'pp={engine_cfg.pp}')
            if self.dp > 1:
                # full 3D composition: dp groups (independent continuous
                # batches) x pp stages x tp shards
                self.mesh = make_mesh_3d(self.dp, engine_cfg.pp,
                                         engine_cfg.tp)
                dp_axis = DP_AXIS
                state_spec = PartitionSpec(DP_AXIS)
            else:
                self.mesh = make_mesh_pp(engine_cfg.pp, engine_cfg.tp)
                dp_axis = None
                state_spec = PartitionSpec()
            self._cache_sh = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s),
                pp_cache_pspecs(dp_axis=dp_axis,
                                per_head_scales=self._per_head_kv,
                                token_scales=self._dyn_kv),
                is_leaf=lambda x: isinstance(x, PartitionSpec))
            self._state_sharding = NamedSharding(self.mesh, state_spec)
            self.cache, self.state = self._alloc_device_state()
            self.params = prepare_params_for_tp(params, model_cfg,
                                                engine_cfg.tp)
            # lm_head vocab-shards over (pp, tp): materialize + pad it
            self.params = prepare_params_for_pp(self.params,
                                                engine_cfg.pp,
                                                engine_cfg.tp)
            if self._packed_int4_enabled():
                from ..parallel.tp import pack_params_for_tp
                self.params = pack_params_for_tp(self.params,
                                                 engine_cfg.tp)
            self.params = shard_tree(self.params,
                                     pp_param_pspecs(self.params),
                                     self.mesh)
            self.fns = PPStepFns(model_cfg, self.mesh,
                                 use_pallas_attn=self._pallas_enabled(),
                                 dp_shard_batch=self.dp > 1,
                                 per_head_kv_scales=self._per_head_kv,
                                 token_kv_scales=self._dyn_kv)
        elif engine_cfg.tp > 1 or self.dp > 1:
            # One SPMD program over the (dp, tp) mesh replaces the
            # reference's per-GPU threads + NCCL ranks (turbomind.py:
            # 125-136); dp groups are independent continuous batches with
            # their own page-pool shard (pool-local page ids).
            from jax.sharding import NamedSharding, PartitionSpec

            from ..parallel.tp import (DP_AXIS, ShardedStepFns, cache_pspecs,
                                       make_mesh, param_pspecs,
                                       prepare_params_for_tp,
                                       shard_tree)
            self.mesh = make_mesh(engine_cfg.tp, self.dp)
            dp_axis = DP_AXIS if self.dp > 1 else None
            # allocate the KV pool directly with its target sharding —
            # allocate-then-device_put would transiently hold the full
            # unsharded pool (tp x per-device budget) and OOM at startup
            self._cache_sh = jax.tree.map(
                lambda s: NamedSharding(self.mesh, s),
                cache_pspecs(dp_axis=dp_axis,
                             per_head_scales=self._per_head_kv,
                             token_scales=self._dyn_kv),
                is_leaf=lambda x: isinstance(x, PartitionSpec))
            state_spec = PartitionSpec(DP_AXIS) if self.dp > 1 \
                else PartitionSpec()
            self._state_sharding = NamedSharding(self.mesh, state_spec)
            self.cache, self.state = self._alloc_device_state()
            self.params = prepare_params_for_tp(params, model_cfg,
                                                engine_cfg.tp)
            if self._packed_int4_enabled():
                # true sub-byte residency under TP: per-rank half-split
                # repack so contiguous shards are kernel-correct blocks
                from ..parallel.tp import pack_params_for_tp
                self.params = pack_params_for_tp(self.params,
                                                 engine_cfg.tp)
            self.params = shard_tree(self.params,
                                     param_pspecs(self.params), self.mesh)
            self.fns = ShardedStepFns(model_cfg, self.mesh,
                                      use_pallas_attn=self._pallas_enabled(),
                                      dp_shard_batch=self.dp > 1,
                                      per_head_kv_scales=self._per_head_kv,
                                      token_kv_scales=self._dyn_kv)
        else:
            self.mesh = None
            if self._packed_int4_enabled():
                # true sub-byte W4A16 residency: half the weight HBM
                # traffic/memory; decode rides the Pallas packed kernel
                # (ops/pallas/quant_matmul.py).  TP engines repack
                # per-rank via parallel.tp.pack_params_for_tp above.
                from ..models.llama import pack_params
                self.params = pack_params(self.params)
            self.cache, self.state = self._alloc_device_state()
            self.fns = CompiledStepFns(model_cfg,
                                       use_pallas_attn=self._pallas_enabled())

        # Session store: per-dp-group managers (each owning one pool shard
        # with pool-local page ids) behind a grouped façade; native C++
        # cache manager (csrc/cache_manager.cpp, the reference's
        # LlamaCacheManager as a host runtime component) with the pure-
        # Python manager as fallback.
        import os
        from ..kvcache.manager import GroupedSequenceManager
        pages_local = num_pages // self.dp
        managers = None
        if os.environ.get('LMDEPLOY_TPU_NATIVE', '1') != '0':
            try:
                from ..kvcache.native import NativeSequenceManager, load
                if load() is not None:
                    managers = [NativeSequenceManager(
                        pages_local, page, engine_cfg.cache_max_entry_count,
                        enable_prefix_cache=engine_cfg.enable_prefix_caching)
                        for _ in range(self.dp)]
            except Exception:
                log.exception('native cache manager unavailable; '
                              'falling back to Python')
        if managers is None:
            managers = [SequenceManager(
                PageAllocator(pages_local), page,
                engine_cfg.cache_max_entry_count,
                enable_prefix_cache=engine_cfg.enable_prefix_caching)
                for _ in range(self.dp)]
        self.seqs = GroupedSequenceManager(managers)
        self._scratch_id = -(1 << 40)  # logits-path scratch session ids

        self.slots: List[Optional[_Slot]] = [None] * b
        self._prefill_jobs: List = []  # (slot_idx, ids, start_pos)
        # observability counters (beyond-reference; the reference has
        # only leveled logs — SURVEY.md §5 metrics row)
        self.stats = {'requests': 0, 'finished': 0, 'canceled': 0,
                      'errors': 0, 'rejected': 0, 'timeout': 0,
                      'generated_tokens': 0, 'spec_rounds': 0,
                      'spec_emitted': 0, 'spec_fallbacks': 0,
                      'interleaved_rounds': 0, 'prefix_hit_tokens': 0,
                      'ring_rounds': 0}
        # bubble-free pp ring decode eligibility: any local batch rides
        # the ring (pp_decode_sampled pads indivisible batches with
        # inactive microbatch rows internally)
        self._ring_ok = engine_cfg.pp > 1 and engine_cfg.pp_ring_decode
        # adaptive speculative gating: EMA of accepted tokens/round;
        # below break-even the engine falls back to plain rounds and
        # re-probes after a cooloff (speculation must never cost more
        # than it saves on non-repetitive text)
        self._spec_accept_ema: Optional[float] = None
        self._spec_cooloff = 0
        self.SPEC_MIN_ACCEPT = 1.15   # verify overhead break-even
        self.SPEC_COOLOFF_DISPATCHES = 4
        # occupancy gate: verify's [G, M, N] partial-sum traffic grows
        # with M = running*(K+1) while plain batched decode amortizes
        # weights over `running` tokens anyway.  Measured on v5e (K=4):
        # 1 slot +64%, 2 slots +22%, 4 slots +13%, 8 slots -1% -> the
        # crossover sits near 32 verify rows.
        self.SPEC_MAX_VERIFY_ROWS = 32
        # top-N alternative plane cap (OpenAI completions caps the
        # logprobs int at 5; chat top_logprobs larger values clip here).
        # Each extra N adds two [k, B] int32 readback planes
        self.MAX_TOP_LOGPROBS = 5
        self._fresh_admission = False
        self._ramp = 1  # post-admission round-length ramp (1->4->16->k)
        self._rng_now: Optional[np.ndarray] = None  # [B, 2] rng keys at the
        # CURRENT substep of the round being emitted (per-substep snapshot)
        self._requests: queue.Queue = queue.Queue()
        self._pending: List = []  # requests waiting for a free slot
        self._shutdown = False
        self._needs_recovery = False
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name='tpu-engine')
        # start=False builds the device state + compiled fns but leaves
        # the scheduler thread parked: cross-host SPMD roles attach
        # first (parallel/multihost.py serve_leader wraps self.fns; a
        # follower never schedules at all, it replays leader frames)
        if start:
            self._thread.start()

    def start(self):
        """Start the scheduler thread of a ``start=False`` engine."""
        if not self._thread.is_alive():
            self._thread.start()

    # -- construction helpers ------------------------------------------------
    def _alloc_device_state(self):
        """Fresh KV pool + decode state with their target shardings."""
        cache = init_cache(
            self.cfg.num_layer, self.num_pages, self.ecfg.page_size,
            self.cfg.kv_head_num, self.cfg.size_per_head, self._kv_dtype,
            self._kv_scales, shardings=self._cache_sh,
            dynamic_scales=self._dyn_kv)
        state = init_decode_state(self.ecfg.max_batch_size,
                                  self.max_pages_per_seq, self.session_len,
                                  eos_id=self.cfg.end_id)
        if self._state_sharding is not None:
            state = jax.tree.map(
                lambda x: jax.device_put(x, self._state_sharding), state)
        return cache, state

    def _recover_device_state(self):
        """Rebuild device state after a backend execution error: donated
        cache/state handles are poisoned once a dispatch fails, and the
        pool's KV content is unrecoverable — drop every session (clients
        re-decode from token ids on their next request) and reallocate.
        Keeps the engine serving instead of erroring forever (the
        reference FT_CHECK-aborts the whole process on CUDA errors)."""
        log.warning('resetting device state after backend error')
        try:
            self.seqs.clear()
        except Exception:
            log.exception('session clear failed during recovery')
        self.cache, self.state = self._alloc_device_state()
        self._rng_now = None
        self._prefill_jobs = []

    def _pallas_enabled(self) -> bool:
        if not self.ecfg.use_pallas:
            return False
        from ..ops import pallas as pallas_ops
        return getattr(pallas_ops, 'PAGED_ATTENTION_AVAILABLE', False)

    def _packed_int4_enabled(self) -> bool:
        """True 4-bit packed weight residency (in-dot Pallas nibble
        unpack): DEFAULT ON on real TPU — measured 900 GB/s effective
        packed-byte streaming with full-N kernel tiles, i.e. half the
        byte-per-int4 path's HBM traffic AND no scan-xs slice copies
        (.r4/kernel_tune3.log).  CPU defaults OFF (interpret-mode Pallas
        is test-only).  Override either way: LMDEPLOY_TPU_PACKED_INT4=
        0/1.  Unpackable weight shapes fall back per-weight inside
        pack_params."""
        import os
        v = os.environ.get('LMDEPLOY_TPU_PACKED_INT4', '')
        if v == '0':
            return False
        if v != '1':
            import jax
            if jax.devices()[0].platform != 'tpu':
                return False
        return self.cfg.weight_type == 'int4' and self._pallas_enabled()

    def _derive_num_pages(self) -> int:
        """Size the page pool from a fraction of free device memory
        (reference sizes by cache_max_entry_count slabs)."""
        page = self.ecfg.page_size
        # KV heads shard across tp devices and LAYERS across pp stages,
        # so per-device bytes shrink by tp*pp.
        elem_bytes = {'int8': 1.0, 'int4': 0.5}.get(self.ecfg.kv_dtype, 2.0)
        bytes_per_tok = int(self.cfg.num_layer * 2 * self.cfg.kv_head_num
                            * self.cfg.size_per_head * elem_bytes
                            // max(1, self.ecfg.tp)
                            // max(1, self.ecfg.pp))
        if self.ecfg.kv_dtype == 'int4':
            # dynamic per-token qparam pools: 4 f32 values per
            # token-head-GROUP (runs before kv_scales are known; counting
            # them for static-qparams int4 too just under-sizes the pool)
            from ..kvcache.paged import kv_dyn_groups
            bytes_per_tok += int(self.cfg.num_layer * 4 * 4
                                 * kv_dyn_groups(self.cfg.size_per_head)
                                 * self.cfg.kv_head_num
                                 // max(1, self.ecfg.tp)
                                 // max(1, self.ecfg.pp))
        budget = None
        try:
            stats = jax.devices()[0].memory_stats()
            if stats:
                limit = stats.get('bytes_limit')
                in_use = stats.get('bytes_in_use', 0)
                if limit:
                    budget = (limit - in_use) * self.ecfg.hbm_utilization
        except Exception:
            pass
        if budget is None:
            # fall back to enough pages for max_batch full sessions
            return self.ecfg.max_batch_size * self.max_pages_per_seq
        # the page dim shards over dp groups: each group's shard fills one
        # device's budget, so the global pool is dp x that
        pages = int(budget // (bytes_per_tok * page)) * self.dp
        floor = 2 * self.max_pages_per_seq * self.dp
        return max(pages, floor)

    # -- public API ----------------------------------------------------------
    def create_instance(self) -> 'EngineInstance':
        return EngineInstance(self)

    def alive(self) -> bool:
        """Whether the engine thread is serving (it survives backend
        errors by design; False after shutdown or a crash bug)."""
        return self._thread.is_alive()

    def submit(self, request: EngineRequest) -> queue.Queue:
        out_q: queue.Queue = queue.Queue()
        if not self.alive():
            # fail fast instead of queueing into a dead engine — a
            # client blocked on this queue would hang forever
            out_q.put(EngineOutput(ResponseType.INTERNAL_ERROR, [], 0,
                                   finished=True))
            return out_q
        # backpressure: bound queued + deferred work (reference blocks in
        # RequestQueue; a serving engine must reject instead — the
        # frontend turns QUEUE_FULL into HTTP 429)
        cap = self.ecfg.max_pending_requests
        if cap and not (request.stop or request.return_logits) \
                and self._requests.qsize() + len(self._pending) >= cap:
            self.stats['rejected'] += 1
            out_q.put(EngineOutput(ResponseType.QUEUE_FULL, [], 0,
                                   finished=True))
            return out_q
        self._requests.put((request, out_q, time.monotonic()))
        return out_q

    def overloaded(self) -> bool:
        """Cheap pre-admission check for HTTP-level 429 responses."""
        cap = self.ecfg.max_pending_requests
        return bool(cap) and \
            self._requests.qsize() + len(self._pending) >= cap

    def metrics(self) -> Dict[str, float]:
        """Counters + gauges for the /metrics endpoint (beyond-reference:
        the reference exposes no serving metrics, SURVEY.md §5)."""
        out = dict(self.stats)
        out['queue_depth'] = self._requests.qsize()
        out['pending_requests'] = len(self._pending)
        out['slots_busy'] = sum(1 for s in self.slots if s is not None)
        out['slots_total'] = len(self.slots)
        for g in range(self.dp):
            out[f'free_pages_group{g}'] = self.seqs.free_count(g)
        return out

    def shutdown(self):
        self._shutdown = True
        if self._thread.is_alive():
            self._thread.join(timeout=10)

    def end_session(self, session_id: int):
        """Free a session's cache (sequence_end)."""
        req = EngineRequest(session_id=session_id, input_ids=[],
                            gen_config=GenerationConfig(), stop=True,
                            sequence_end=True)
        self.submit(req)

    def cancel(self, session_id: int):
        req = EngineRequest(session_id=session_id, input_ids=[],
                            gen_config=GenerationConfig(), stop=True)
        self.submit(req)

    # -- engine loop ----------------------------------------------------------
    def _fail_all_safe(self):
        """_fail_all, but a failed re-allocation (backend still
        exhausted) arms a retry flag instead of killing the engine
        thread — and the retry happens PROACTIVELY at the top of each
        loop turn, not at the expense of the next request dispatched
        against the stale poisoned state."""
        try:
            self._fail_all()
            self._needs_recovery = False
        except Exception:
            log.exception('device-state recovery failed; will retry '
                          'each loop turn')
            self._needs_recovery = True
            time.sleep(0.5)

    def _loop(self):
        while not self._shutdown:
            if getattr(self, '_needs_recovery', False):
                try:
                    self._recover_device_state()
                    self._needs_recovery = False
                except Exception:
                    log.exception('device-state recovery failed; will '
                                  'retry each loop turn')
                    time.sleep(0.5)
            busy = any(s is not None for s in self.slots) or self._pending
            try:
                timeout = 0.0 if busy else 0.05
                batch = [self._requests.get(timeout=timeout)]
                while True:  # drain whatever else queued
                    try:
                        batch.append(self._requests.get_nowait())
                    except queue.Empty:
                        break
                self._handle_batch(batch)
            except queue.Empty:
                pass
            except Exception:
                log.exception('request handling failed')
            # retry deferred admissions once slots freed up
            if self._pending and self._free_slot_index() is not None:
                pending, self._pending = self._pending, []
                for item in pending:
                    self._handle_safe(*item)
            # batched multi-slot prefill of everything admitted this turn
            # (reference: one chunked context-decode pass over all new
            # requests, LlamaBatch.cc:795-858)
            if self._prefill_jobs:
                try:
                    self._flush_prefills()
                except Exception:
                    log.exception('prefill flush failed')
                    self._fail_all_safe()
            if any(s is not None and not s.done for s in self.slots):
                try:
                    self._decode_round(self.ecfg.step_length)
                except Exception:
                    log.exception('decode round failed')
                    self._fail_all_safe()

    def _fail_all(self):
        """Fail every running request, then rebuild the device state so
        the engine stays usable (after an execution error the donated
        cache/state are poisoned; a leaked active session would pin its
        pages forever — _evict_one skips active sequences)."""
        for i, slot in enumerate(self.slots):
            if slot is None:
                continue
            slot.out_q.put(EngineOutput(ResponseType.INTERNAL_ERROR, [],
                                        slot.generated, finished=True))
            try:
                self.seqs.erase(slot.request.session_id)
            except Exception:
                log.exception('session release failed during _fail_all')
            self.slots[i] = None
        self._recover_device_state()

    # -- request handling ------------------------------------------------------
    def _handle_batch(self, batch):
        """Stops first; duplicate session ids among queued inference
        requests rejected (reference verifyRequests SESSION_REPEAT,
        Request.h:28-35); admissions sorted by input length so long
        prompts claim slots first (LlamaBatch.cc:619-627)."""
        stops = [it for it in batch if it[0].stop or it[0].return_logits]
        infers = [it for it in batch if not (it[0].stop
                                             or it[0].return_logits)]
        for item in stops:
            self._handle_safe(*item)
        seen = set()
        for req, out_q, t in sorted(infers,
                                    key=lambda it: -len(it[0].input_ids)):
            if req.session_id in seen:
                out_q.put(EngineOutput(ResponseType.SESSION_REPEAT, [], 0,
                                       finished=True))
                continue
            seen.add(req.session_id)
            self._handle_safe(req, out_q, t)

    def _handle_safe(self, req: EngineRequest, out_q: queue.Queue,
                     enq_t: Optional[float] = None):
        """Per-request isolation: one failing request must answer ITS
        client and never abort the rest of the drained batch."""
        timeout = self.ecfg.request_timeout
        if timeout and enq_t is not None and not req.stop \
                and time.monotonic() - enq_t > timeout:
            self.stats['timeout'] += 1
            out_q.put(EngineOutput(ResponseType.TIMEOUT, [], 0,
                                   finished=True))
            return
        try:
            self._handle_request(req, out_q, enq_t)
        except Exception as e:
            log.exception('request handling failed (session %s)',
                          req.session_id)
            self.stats['errors'] += 1
            out_q.put(EngineOutput(ResponseType.INTERNAL_ERROR, [], 0,
                                   finished=True))
            # a backend execution error poisons donated device buffers
            # (e.g. the logits path's donated cache) — rebuild
            if 'RuntimeError' in type(e).__name__:
                self._fail_all()

    def _handle_request(self, req: EngineRequest, out_q: queue.Queue,
                        enq_t: Optional[float] = None):
        if req.stop:
            self._handle_stop(req, out_q)
            return
        if req.return_logits:
            self._handle_logits(req, out_q)
            return
        # verification (reference: LlamaBatch::verifyRequests)
        for slot in self.slots:
            if slot is not None and slot.request.session_id == req.session_id \
                    and not slot.done:
                out_q.put(EngineOutput(ResponseType.SESSION_BUSY, [], 0,
                                       finished=True))
                return
        if not req.sequence_start and req.session_id not in self.seqs:
            out_q.put(EngineOutput(ResponseType.SESSION_NOT_EXIST, [], 0,
                                   finished=True))
            return
        try:
            self._admit(req, out_q, enq_t)
        except NoFreePages:
            out_q.put(EngineOutput(ResponseType.INTERNAL_ERROR, [], 0,
                                   finished=True))

    def _handle_stop(self, req: EngineRequest, out_q: queue.Queue):
        # cancel requests still waiting for a slot
        kept = []
        for preq, pq, pt in self._pending:
            if preq.session_id == req.session_id:
                pq.put(EngineOutput(ResponseType.CANCELED, [], 0,
                                    finished=True))
            else:
                kept.append((preq, pq, pt))
        self._pending = kept
        for i, slot in enumerate(self.slots):
            if slot is not None and slot.request.session_id == req.session_id:
                self.state = self.fns.set_finished(self.state, i)
                slot.done = True
                slot.out_q.put(EngineOutput(
                    ResponseType.CANCELED,
                    slot.seq.token_ids[slot.prompt_len:],
                    slot.generated, finished=True))
                self._retire(i, ResponseType.CANCELED)
                break
        if req.sequence_end:
            self.seqs.erase(req.session_id)
        out_q.put(EngineOutput(ResponseType.SUCCESS, [], 0, finished=True))

    def _handle_logits(self, req: EngineRequest, out_q: queue.Queue):
        """Prompt-logits path (reference: TurboMindInstance.decode,
        turbomind.py:364-411 + LlamaBatch::outputContextLogits). Runs on
        the engine thread so the state surgery can't race decode rounds;
        uses a scratch session that never enters the decode batch."""
        ids = list(map(int, req.input_ids))
        if not ids or len(ids) > self.session_len:
            out_q.put(EngineOutput(ResponseType.INPUT_TOO_LONG, [], 0,
                                   finished=True))
            return
        self._scratch_id -= 1  # unique negative key, can't collide
        scratch_id = self._scratch_id
        # scratch sessions pin to group 0: the dp prefill_logits program
        # masks writes to group 0's pool shard and psum-selects its logits
        seq = self.seqs.create(scratch_id, group=0)
        seq.active = True  # shield from LRU eviction / trim
        try:
            self.seqs.grow(seq, len(ids))
            row = np.full((self.max_pages_per_seq,), -1, np.int32)
            row[:len(seq.pages)] = seq.pages
            out = []
            for padded, pos, n in self._iter_chunks(ids, 0):
                self.cache, logits = self.fns.prefill_logits_row(
                    self.params, self.cache, row, padded,
                    np.int32(pos), np.int32(n))
                out.append(np.asarray(logits[:n, :self.cfg.vocab_size]))
            logits = np.concatenate(out, axis=0)
            out_q.put(EngineOutput(ResponseType.FINISH, [], 0, finished=True,
                                   logits=logits))
        except NoFreePages:
            out_q.put(EngineOutput(ResponseType.INTERNAL_ERROR, [], 0,
                                   finished=True))
        finally:
            self.seqs.erase(scratch_id)

    def _free_slot_index(self, group: Optional[int] = None) -> Optional[int]:
        """First free slot, constrained to ``group``'s slot range when a
        session is sticky to a dp group (its pages live in that group's
        pool shard)."""
        if group is None:
            rng = range(len(self.slots))
        else:
            rng = range(group * self.b_local, (group + 1) * self.b_local)
        for i in rng:
            if self.slots[i] is None:
                return i
        return None

    def _pick_group(self) -> Optional[int]:
        """Least-loaded dp group with a free slot (running slots first,
        then free pages) — the per-group admission balancer."""
        best, best_key = None, None
        for g in range(self.dp):
            if self._free_slot_index(g) is None:
                continue
            running = sum(1 for i in range(g * self.b_local,
                                           (g + 1) * self.b_local)
                          if self.slots[i] is not None)
            key = (running, -self.seqs.free_count(g))
            if best_key is None or key < best_key:
                best, best_key = g, key
        return best

    def _admit(self, req: EngineRequest, out_q: queue.Queue,
               enq_t: Optional[float] = None):
        # dp-group routing: existing sessions are sticky to the group
        # holding their pages; new sessions go to the least-loaded group
        if not req.sequence_start and req.session_id in self.seqs:
            group = self.seqs.group_of(req.session_id)
            slot_idx = self._free_slot_index(group)
        else:
            group = self._pick_group() if self.dp > 1 else 0
            slot_idx = None if group is None \
                else self._free_slot_index(group)
        if slot_idx is None:
            # Busy engine: defer until a slot frees up — the continuous-
            # batching wait (reference blocks in its RequestQueue).
            self._pending.append((req, out_q,
                                  enq_t if enq_t is not None
                                  else time.monotonic()))
            return
        self.stats['requests'] += 1

        # sessions (reference: LlamaBatch::initialize fetch/create)
        if req.sequence_start:
            seq = self.seqs.create(req.session_id, group)
        else:
            seq = self.seqs.fetch(req.session_id)
            if req.step and req.step < len(seq.token_ids):
                # rewind KV to an earlier step (interactive API); shared
                # prefix pages at/after the rewrite point are privatized
                # (prefix caching invariant: shared pages are immutable)
                seq.token_ids = seq.token_ids[:req.step]
                seq.cache_len = self.seqs.prepare_rewrite(
                    seq, min(seq.cache_len, req.step))

        new_ids = list(map(int, req.input_ids))
        # cache-miss re-decode: evicted sequences lost pages, so everything
        # after cache_len must be prefilled again (LlamaBatch.cc:680-699)
        all_ids = seq.token_ids + new_ids
        total_len = len(all_ids)
        if total_len + 1 > self.session_len:
            out_q.put(EngineOutput(ResponseType.INPUT_TOO_LONG, [], 0,
                                   finished=True))
            return
        gen = req.gen_config.clip(self.cfg.vocab_size)
        # truncate output to session_len (reference LlamaBatch.cc:703-719)
        max_new = min(gen.max_new_tokens,
                      self.session_len - total_len)
        if max_new <= 0:
            out_q.put(EngineOutput(ResponseType.INPUT_TOO_LONG, [], 0,
                                   finished=True))
            return

        # cross-session prefix caching (beyond-reference, vLLM-style):
        # a pageless sequence — fresh, or evicted and about to re-decode —
        # attaches published pages covering its page-aligned prompt
        # prefix and skips their prefill entirely
        if self.ecfg.enable_prefix_caching and not seq.pages \
                and seq.cache_len == 0:
            hit = self.seqs.match_prefix(seq, all_ids)
            if hit:
                self.stats['prefix_hit_tokens'] += hit

        seq.active = True
        self.seqs.grow(seq, total_len)  # pages for the prompt
        prefill_ids = all_ids[seq.cache_len:-1] if total_len > 1 else []
        start_pos = seq.cache_len

        # page table row
        page_row = np.full((self.max_pages_per_seq,), -1, np.int32)
        page_row[:len(seq.pages)] = seq.pages

        # history row = full token history
        hist = np.zeros((self.session_len,), np.int32)
        hist[:total_len] = all_ids

        # sampling row
        srow = self._sampling_row(gen, seq, max_new)

        # numpy/python args transfer inside the ONE jitted dispatch —
        # eager jnp conversions each cost a host<->device round trip.
        self.state = self.fns.install_slot(
            self.state, slot_idx,
            np.int32(all_ids[-1]), np.int32(total_len - 1),
            hist, np.int32(total_len), page_row, srow)

        stop_seqs = self._stop_sequences(gen)
        multi = [sw for sw in stop_seqs if len(sw) > 1]
        from ..ops.sampling import MAX_STOP_BAD_WORDS as _CAP
        singles = [sw[0] for sw in stop_seqs if len(sw) == 1]
        slot = _Slot(request=req, seq=seq, out_q=out_q,
                     context_len=total_len - 1, prompt_len=total_len,
                     stop_sequences=multi,
                     single_stops=frozenset(singles[:_CAP]),
                     host_single_stops=frozenset(singles[_CAP:]),
                     holdback=max((len(sw) for sw in multi), default=1) - 1,
                     max_new=max_new)
        self.slots[slot_idx] = slot
        self._fresh_admission = True  # short first round for TTFT
        seq.token_ids = all_ids

        # defer the chunked prefill: all admissions drained this turn
        # prefill TOGETHER in one batched pass (_flush_prefills); until
        # then the slot sits INACTIVE so interleaved decode rounds never
        # touch its unwritten KV
        if prefill_ids:
            slot.prefilling = True
            self.state = self.fns.set_active(self.state, slot_idx, False)
            self._prefill_jobs.append((slot_idx, prefill_ids, start_pos))
        slot.context_len = total_len - 1

    def _stop_sequences(self, gen: GenerationConfig) -> List[List[int]]:
        out = []
        for w in (gen.stop_words or self.default_stop_words):
            out.append([int(x) for x in w] if isinstance(w, (list, tuple))
                       else [int(w)])
        return out

    def _sampling_row(self, gen: GenerationConfig, seq, max_new) -> SamplingState:
        from ..ops.sampling import MAX_STOP_BAD_WORDS as CAP
        stop_flat = [w[0] for w in self._stop_sequences(gen) if len(w) == 1]
        if len(stop_flat) > CAP:
            log.debug('%d single-token stops exceed device capacity %d; '
                      'overflow is matched host-side', len(stop_flat), CAP)
        stop = np.full((CAP,), -1, np.int32)
        stop[:min(CAP, len(stop_flat))] = stop_flat[:CAP]
        bad = np.full((CAP,), -1, np.int32)
        bw = [int(x) for x in (gen.bad_words or [])]
        if len(bw) > CAP:
            log.warning('truncating %d bad words to capacity %d',
                        len(bw), CAP)
        bad[:min(CAP, len(bw))] = bw[:CAP]
        if seq.rng_key is not None and gen.random_seed is None:
            key = np.asarray(seq.rng_key, np.uint32)
        else:
            seed = gen.random_seed if gen.random_seed is not None \
                else np.random.randint(0, 2 ** 31 - 1)
            # threefry key data on host (what jax.random.PRNGKey builds)
            seed = int(seed)
            key = np.array([seed >> 32 & 0xFFFFFFFF, seed & 0xFFFFFFFF],
                           np.uint32)
        return SamplingState(
            top_k=np.int32(gen.top_k or 0),
            top_p=np.float32(gen.top_p),
            min_p=np.float32(gen.min_p),
            temperature=np.float32(gen.temperature),
            repetition_penalty=np.float32(gen.repetition_penalty),
            presence_penalty=np.float32(gen.presence_penalty),
            frequency_penalty=np.float32(gen.frequency_penalty),
            rng_key=key,
            bad_words=bad,
            stop_words=stop,
            eos_id=np.int32(self.cfg.end_id),
            ignore_eos=np.asarray(gen.ignore_eos),
            min_new_tokens=np.int32(gen.min_new_tokens),
            max_new_tokens=np.int32(max_new),
        )

    # -- prefill ----------------------------------------------------------------
    def _iter_chunks(self, ids: List[int], start_pos: int):
        """Yield (padded int32 [bucket], pos, length) prompt chunks bounded
        by BOTH max_context_token_num and the largest prefill bucket
        (reference: chunked context decode, LlamaBatch.cc:795-858)."""
        buckets = list(self.ecfg.prefill_buckets)
        budget = min(self.ecfg.max_context_token_num, buckets[-1])
        pos = start_pos
        remaining = list(ids)
        while remaining:
            chunk = remaining[:budget]
            remaining = remaining[budget:]
            padded = np.zeros((_bucket_for(len(chunk), buckets),), np.int32)
            padded[:len(chunk)] = chunk
            yield padded, pos, len(chunk)
            pos += len(chunk)

    def _interleave_decode(self):
        """Squeeze a short decode round between prefill chunk passes so
        already-running sessions keep streaming during a long admission
        (SARATHI-style chunked-prefill scheduling; the reference stalls
        generation for the whole context decode, LlamaBatch.cc:764-876).
        Mid-prefill slots sit INACTIVE on device and are skipped here."""
        k = self.ecfg.prefill_interleave
        if k <= 0:
            return
        if not any(s is not None and not s.done and not s.prefilling
                   for s in self.slots):
            return
        try:
            self.stats['interleaved_rounds'] += 1
            # snap to a round length normal operation has ALREADY
            # compiled (1 = admission ramp, step_length = steady state):
            # a novel length jits a third scan program on the first long
            # admission, stalling running slots ~5.7s mid-stream
            # (measured on-chip, .r4/interleave.json gap_max)
            k = self.ecfg.step_length if k >= self.ecfg.step_length else 1
            self._decode_round(k)
        except Exception:
            log.exception('interleaved decode round failed')
            self._fail_all()

    def _flush_prefills(self):
        """Prefill every queued admission in batched chunk passes: each
        round appends ONE chunk for every still-unfinished job (the
        reference's batched chunked context decode, LlamaBatch.cc:
        795-858) so concurrent admissions share device dispatches instead
        of serializing their TTFT; decode rounds for already-running
        slots interleave between passes."""
        jobs = [(i, ids, start) for i, ids, start in self._prefill_jobs
                if self.slots[i] is not None and not self.slots[i].done]
        self._prefill_jobs = []
        if not jobs:
            return
        buckets = list(self.ecfg.prefill_buckets)
        budget = min(self.ecfg.max_context_token_num, buckets[-1])
        b = self.ecfg.max_batch_size
        bp_buckets = [x for x in (2, 4, 8, 16, 32, 64) if x < b] + [b]
        offs = [0] * len(jobs)
        while True:
            live = [(j, jobs[j][0]) for j in range(len(jobs))
                    if offs[j] < len(jobs[j][1])
                    and self.slots[jobs[j][0]] is not None]
            if not live:
                break
            if len(live) == 1:
                j, slot_idx = live[0]
                _, ids, start = jobs[j]
                chunk = ids[offs[j]:offs[j] + budget]
                for padded, pos, n in self._iter_chunks(
                        chunk, start + offs[j]):
                    self.cache, _ = self.fns.prefill_chunk(
                        self.params, self.cache, self.state,
                        np.int32(slot_idx), padded, np.int32(pos),
                        np.int32(n))
                offs[j] += len(chunk)
            else:
                # cap the AGGREGATE tokens of one batched pass at the
                # prefill budget (a per-row budget would dispatch up to
                # rows x budget tokens in one pass — past what this
                # backend tolerates under memory pressure): shrink the
                # per-row chunk with the padded row count, floored at the
                # smallest bucket; rows beyond the cap wait for the next
                # loop iteration (their offs are untouched)
                max_rows = max(2, budget // buckets[0])
                live = live[:max_rows]
                bp_cap = _bucket_for(len(live), bp_buckets)
                row_budget = max(buckets[0], budget // bp_cap)
                chunks = []
                for j, slot_idx in live:
                    _, ids, start = jobs[j]
                    chunk = ids[offs[j]:offs[j] + row_budget]
                    chunks.append((slot_idx, chunk, start + offs[j]))
                    offs[j] += len(chunk)
                t = _bucket_for(max(len(c) for _, c, _ in chunks), buckets)
                bp = _bucket_for(len(chunks), bp_buckets)
                ids_arr = np.zeros((bp, t), np.int32)
                slots_arr = np.zeros((bp,), np.int32)
                starts_arr = np.zeros((bp,), np.int32)
                lens_arr = np.zeros((bp,), np.int32)  # pad rows: length 0
                for r, (slot_idx, chunk, pos) in enumerate(chunks):
                    ids_arr[r, :len(chunk)] = chunk
                    slots_arr[r] = slot_idx
                    starts_arr[r] = pos
                    lens_arr[r] = len(chunk)
                self.cache, _ = self.fns.prefill_chunks(
                    self.params, self.cache, self.state, slots_arr,
                    ids_arr, starts_arr, lens_arr)
            self._interleave_decode()
        for j, (slot_idx, ids, start) in enumerate(jobs):
            slot = self.slots[slot_idx]
            if slot is None or slot.done:
                continue
            slot.seq.cache_len = start + len(ids)
            slot.prefilling = False
            self.state = self.fns.set_active(self.state, slot_idx, True)
            if self.ecfg.enable_prefix_caching:
                # insert-only publish (sequence still active): the
                # freshly prefilled prompt becomes shareable NOW, not at
                # retirement — followers of a long-running generation
                # skip its prompt prefill
                self.seqs.publish(slot.seq)
        # the freshly activated slots deserve a short first round (TTFT)
        self._fresh_admission = True

    # -- decode ------------------------------------------------------------------
    def _grow_pages(self, steps: int = 1):
        """Allocate pages for the next ``steps`` tokens of every running
        slot (pre-growth so a multi-step device round never crosses an
        unmapped page boundary)."""
        page = self.ecfg.page_size
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or slot.prefilling:
                continue
            need_tokens = min(slot.context_len + steps, self.session_len)
            if need_tokens > len(slot.seq.pages) * page:
                self.seqs.grow(slot.seq, need_tokens)
                row = np.full((self.max_pages_per_seq,), -1, np.int32)
                row[:len(slot.seq.pages)] = slot.seq.pages
                self.state = self.fns.set_page_row(self.state, i, row)

    def _decode_round(self, steps: int):
        """One device round of ``steps`` decode steps with a single
        dispatch + a single [5, k, B] readback (reference: step_length;
        here it also amortizes host<->device link latency).  After an
        admission the round length ramps 1 -> 4 -> 16 -> step_length so
        the first tokens stream immediately (TTFT) while sustained decode
        still amortizes the link round trip."""
        if not any(s is not None and not s.done and not s.prefilling
                   for s in self.slots):
            return
        if self._fresh_admission:
            # one short round so the new request's first token streams
            # immediately; measured: a gradual 1->4->16 ramp costs ~10%
            # batch throughput (every admission resets it) for no TTFT win
            self._ramp = 1
            self._fresh_admission = False
        k = max(1, min(steps, self._ramp))
        self._ramp = max(1, steps)
        self._grow_pages(k)
        # static sampling mode per round — the host knows every running
        # slot's GenerationConfig.  NOTE measured (v5e, k=64 rounds): a
        # dedicated greedy/argmax program compiles to 25.2 ms/tok vs the
        # candidate pipeline's 17.4 — the top_k sort is fully overlapped
        # inside the scan and shortening the sampling dependency chain
        # derails XLA's schedule.  So greedy rides 'candidates'; 'full'
        # exists for exact unconstrained sampling (top_k=0).
        cfgs = [s.request.gen_config for s in self.slots
                if s is not None and not s.done and not s.prefilling]
        # speculative rounds.  Mode is static like the plain path's:
        #   'greedy'     — every slot is plain greedy (no penalties /
        #                  bad words / min-len): raw-argmax verify.
        #   'candidates' — any sampled or penalized slot: exact
        #                  rejection sampling against the processed
        #                  distribution (greedy slots in the mix stay
        #                  token-identical; sampled slots keep the exact
        #                  plain-path marginal at every position).
        #   'full'       — a top_k<=0 slot needs the exact full-vocab
        #                  sort (no top-1024 truncation).
        # output_logprobs slots are served too: the packed rounds carry
        # a per-token logprob plane (greedy logprobs are exactly 0, the
        # plain path's convention).
        running = len(cfgs)
        # top-N alternative logprobs for generated tokens (OpenAI
        # top_logprobs): the plane count is QUANTIZED to {0,
        # MAX_TOP_LOGPROBS} — one extra program per (mode, length)
        # instead of one per distinct N, since a novel static shape
        # jit-compiles mid-serving and stalls running streams (the
        # measured ~5.7s interleave stall class); _emit slices each
        # slot's requested N host-side.  Spec rounds AND the pp ring
        # carry the planes too (spec_decode_rounds' trailing rows /
        # pp_decode_sampled's extra planes), so top_logprobs requests
        # forfeit neither speculation nor the bubble-free ring.
        topn = self.MAX_TOP_LOGPROBS if any(
            (g.top_logprobs or 0) > 0 for g in cfgs) else 0
        spec_mode = None
        # spec keeps its flat break-even under pp: in the weight-
        # bandwidth-bound decode regime a relay verify round and a ring
        # round stream the same weights per stage, so acceptance > 1.15
        # pays exactly as on a flat mesh; in the compute-bound regime the
        # occupancy gate below already hands large batches to the ring
        if self.ecfg.speculative_k > 0 and cfgs \
                and running * (self.ecfg.speculative_k + 1) \
                <= self.SPEC_MAX_VERIFY_ROWS:
            if _all_plain_greedy(cfgs):
                spec_mode = 'greedy'
            elif self.ecfg.speculative_sampled:
                spec_mode = 'full' if any((g.top_k or 0) <= 0
                                          for g in cfgs) else 'candidates'
        if spec_mode is not None:
            if self._spec_cooloff <= 0:
                try:
                    self._spec_round(k, spec_mode, topn=topn)
                    return
                except Exception:
                    # this backend occasionally throws opaque transient
                    # RESOURCE_EXHAUSTED on the spec program: disable
                    # speculation for this engine, fail the in-flight
                    # requests (donated state is poisoned) and keep
                    # serving plain rounds
                    log.exception('speculative dispatch failed; '
                                  'disabling speculation')
                    self._spec_cooloff = 1 << 30
                    self._fail_all()
                    return
            # low recent acceptance: run plain rounds, re-probe later
            self._spec_cooloff -= 1
            self.stats['spec_fallbacks'] += 1
            if self._spec_cooloff == 0:
                self._spec_accept_ema = None  # fresh probe next time
        if self._ring_ok:
            # all traffic rides the bubble-free full-sampling ring on a
            # pp mesh (greedy rides 'candidates' exactly like the plain
            # path — and keeps the keys-advance-every-step invariant);
            # top_logprobs slots too: the ring carries the top-N planes
            self._ring_round(k, 'full' if any((g.top_k or 0) <= 0
                                              for g in cfgs)
                             else 'candidates', topn=topn)
            return
        mode = 'full' if any((g.top_k or 0) <= 0 for g in cfgs) \
            else 'candidates'
        self.cache, self.state, packed, logprob = self.fns.decode_steps(
            self.params, self.cache, self.state, num_steps=k,
            sampling_mode=mode, topn=topn)
        # [5 + 2*topn, k, B]: tok/fin/logprob/rng0/rng1 + top-N planes
        arr = np.asarray(packed)
        logprobs = np.ascontiguousarray(arr[2]).view(np.float32)  # [k, B]
        for t in range(k):
            # per-substep rng snapshot: a slot retired at substep t (host
            # stop sequence) must save the key as of t, not round end
            self._rng_now = np.ascontiguousarray(
                arr[3:5, t].T).view(np.uint32)
            tops = None
            if topn:
                tids = arr[5:5 + topn, t].T                # [B, topn]
                tlps = np.ascontiguousarray(
                    arr[5 + topn:5 + 2 * topn, t].T).view(np.float32)
                tops = (tids, tlps)
            self._emit(arr[0, t], arr[1, t], logprobs[t], tops=tops)
            if not any(s is not None and not s.done for s in self.slots):
                return

    def _ring_round(self, k: int, mode: str = 'candidates',
                    topn: int = 0):
        """Bubble-free microbatch-ring decode on the pp mesh
        (parallel/pp.py:pp_decode_sampled — the full sampling stack, all
        request classes): every running slot advances up to ``k`` tokens
        in ONE pipelined dispatch.  Per-iteration work is per-MICROBATCH
        (B/pp rows), so in the compute-bound regime (large batches) the
        ring approaches pp× the relay's throughput; in the weight-
        bandwidth-bound small-batch regime both paths stream the same
        stage weights per token and roughly tie.  The packed readback
        carries
        decode_steps' per-round logprob and rng planes, so mid-dispatch
        retirement snapshots stay exact.

        The device side runs UNGATED for exactly ``k`` rounds (the ring
        has no per-round stop masking), so the host (a) bounds ``k`` by
        every slot's remaining token allowance — max_new already folds
        the session cap, so the ring can never write KV past allocated
        pages — quantized DOWN to a power of two so the static-shape
        program menu stays tiny ({1,2,4,...,step_length}; an arbitrary
        residual k would compile a fresh scan program mid-serving), and
        (b) applies the stop criteria (EOS / device-capacity stop words
        / length; check_stop's exact semantics) to the [k, B] token
        matrix after readback.  A slot that stops mid-dispatch is
        retired on the spot (_emit -> _retire -> clear_slot), which turns
        its device-side overshoot (context_len / history advanced past
        the stop) into dead state until the next install_slot — no
        rollback surgery needed; the host-side shadows (slot.context_len,
        seq.cache_len) only ever count emitted tokens.
        """
        run = [(i, s) for i, s in enumerate(self.slots)
               if s is not None and not s.done and not s.prefilling]
        k = max(1, min([k] + [s.max_new - s.generated for _, s in run]))
        k = 1 << (k.bit_length() - 1)       # power-of-two program menu
        self._grow_pages(k)
        self.cache, self.state, packed = self.fns.decode_rounds_sampled(
            self.params, self.cache, self.state, rounds=k,
            sampling_mode=mode, topn=topn)
        pk = np.asarray(packed)                 # [4 + 2*topn, k, B]
        arr = pk[0]
        lps = np.ascontiguousarray(pk[1]).view(np.float32)
        rngs = pk[2:4]
        self.stats['ring_rounds'] += k
        b = arr.shape[1]
        fin = np.zeros((b,), np.int32)
        eos = self.cfg.end_id
        for t in range(k):
            # per-round rng snapshot, decode_steps' plane semantics
            self._rng_now = np.ascontiguousarray(
                rngs[:, t].T).view(np.uint32)
            fin[:] = 0
            for i, s in run:
                if s.done:
                    continue
                tok = int(arr[t, i])
                g = s.request.gen_config
                if ((tok == eos and not g.ignore_eos)
                        or tok in s.single_stops
                        or s.generated + 1 >= s.max_new):
                    fin[i] = 1
            tops = None
            if topn:
                tids = pk[4:4 + topn, t].T                 # [B, topn]
                tlps = np.ascontiguousarray(
                    pk[4 + topn:4 + 2 * topn, t].T).view(np.float32)
                tops = (tids, tlps)
            self._emit(arr[t], fin, lps[t], tops=tops)
            if not any(s is not None and not s.done for s in self.slots):
                return

    def _spec_round(self, rounds: int, sampling: str = 'greedy',
                    topn: int = 0):
        """Speculative (prompt-lookup) decode rounds: each dispatch runs
        ``rounds`` draft-verify-accept rounds on device; every round
        yields >= 1 token per running slot and up to speculative_k + 1.
        ``topn`` > 0 additionally reads back per-position top-N
        alternative logprob planes (OpenAI top_logprobs WITHOUT
        forfeiting speculation)."""
        kd = self.ecfg.speculative_k
        kp1 = kd + 1
        self._grow_pages(rounds * kp1)
        self.cache, self.state, packed = self.fns.spec_decode_rounds(
            self.params, self.cache, self.state, num_rounds=rounds,
            k_draft=kd, ngram=self.ecfg.speculative_ngram,
            ngram_min=self.ecfg.speculative_ngram_min, sampling=sampling,
            topn=topn)
        arr = np.asarray(packed)    # [R, 3*kp1+3 (+ 2*kp1*topn), B]
        # adaptive gating: EMA of per-slot accepted tokens/round over
        # this dispatch; below break-even, cool off to plain rounds.
        # Short dispatches (the TTFT ramp's 1-round burst right after
        # admission, when the history is too short for any n-gram match)
        # are NOT evidence — judging from them poisoned the EMA and
        # bounced the engine onto a cold plain-path compile mid-stream.
        live_rounds = arr[:, 2 * kp1]       # [R, B] emitted counts
        ran = live_rounds.sum(axis=1) > 0
        if int(ran.sum()) >= 8:
            acc = float(live_rounds.sum()
                        / np.maximum((live_rounds > 0).sum(), 1))
            ema = self._spec_accept_ema
            self._spec_accept_ema = acc if ema is None \
                else 0.7 * ema + 0.3 * acc
            if self._spec_accept_ema < self.SPEC_MIN_ACCEPT:
                self._spec_cooloff = self.SPEC_COOLOFF_DISPATCHES
        for r in range(arr.shape[0]):
            g, fin, n = arr[r, :kp1], arr[r, kp1:2 * kp1], arr[r, 2 * kp1]
            logp = np.ascontiguousarray(
                arr[r, 2 * kp1 + 1:3 * kp1 + 1]).view(np.float32)
            # per-round rng snapshot (keys advance once per spec round):
            # a slot retired by a host stop sequence during round r saves
            # the key as of round r, not dispatch end
            self._rng_now = np.ascontiguousarray(
                arr[r, 3 * kp1 + 1:3 * kp1 + 3].T).view(np.uint32)
            self.stats['spec_rounds'] += 1
            self.stats['spec_emitted'] += int(n.sum())
            base = 3 * kp1 + 3
            for t in range(kp1):
                mask = t < n
                if not mask.any():
                    break
                tops = None
                if topn:
                    tids = arr[r, base + t * topn:
                               base + (t + 1) * topn].T       # [B, topn]
                    tlps = np.ascontiguousarray(
                        arr[r, base + kp1 * topn + t * topn:
                            base + kp1 * topn + (t + 1) * topn].T
                    ).view(np.float32)
                    tops = (tids, tlps)
                self._emit(g[t], fin[t], logp[t], mask=mask, tops=tops)
                if not any(s is not None and not s.done
                           for s in self.slots):
                    return

    def _emit(self, toks_np: np.ndarray, fin_np: np.ndarray,
              logprobs_np: Optional[np.ndarray] = None,
              mask: Optional[np.ndarray] = None,
              tops: Optional[tuple] = None):
        for i, slot in enumerate(self.slots):
            if slot is None or slot.done or slot.prefilling:
                continue
            if mask is not None and not mask[i]:
                continue
            slot.saw_round = True
            self.stats['generated_tokens'] += 1
            tok = int(toks_np[i])
            gcfg = slot.request.gen_config
            if logprobs_np is not None and (gcfg.output_logprobs
                                            or gcfg.top_logprobs):
                slot.logprobs.append(float(logprobs_np[i]))
            if tops is not None and gcfg.top_logprobs:
                n = min(gcfg.top_logprobs, tops[0].shape[1])
                slot.top_lps.append({
                    int(tid): float(tlp)
                    for tid, tlp in zip(tops[0][i, :n], tops[1][i, :n])})
            slot.generated += 1
            slot.context_len += 1
            slot.seq.token_ids.append(tok)
            slot.seq.cache_len = slot.context_len
            slot.tail.append(tok)
            finished = bool(fin_np[i])
            # host-side multi-token stop sequences + overflow singles
            hit_stop = None
            if tok in slot.host_single_stops:
                hit_stop = [tok]
            else:
                for sw in slot.stop_sequences:
                    if len(slot.tail) >= len(sw) and slot.tail[-len(sw):] == sw:
                        hit_stop = sw
                        break
            if hit_stop and not finished:
                self.state = self.fns.set_finished(self.state, i)
                finished = True
            new_tokens = slot.seq.token_ids[slot.prompt_len:]
            # Stop text never reaches the client (reference: stop words
            # are excluded from output, stop_criteria_kernels.cu).  While
            # running, withhold the last holdback tokens — they may be a
            # stop-sequence prefix; on a stop hit drop the stop tokens.
            if finished:
                if hit_stop:
                    visible = new_tokens[:len(new_tokens) - len(hit_stop)]
                elif tok in slot.single_stops:
                    visible = new_tokens[:-1]
                else:
                    visible = new_tokens
            else:
                visible = new_tokens[:max(0, len(new_tokens)
                                          - slot.holdback)]
            slot.out_q.put(EngineOutput(
                ResponseType.FINISH if finished else ResponseType.SUCCESS,
                list(visible), len(visible), finished=finished,
                logprobs=list(slot.logprobs[:len(visible)])
                if (gcfg.output_logprobs or gcfg.top_logprobs) else None,
                top_logprobs=list(slot.top_lps[:len(visible)])
                if gcfg.top_logprobs else None))
            if finished:
                slot.done = True
                self._retire(i, ResponseType.FINISH)

    def _retire(self, slot_idx: int, status: ResponseType):
        """Release the slot; keep or drop the session per sequence_end
        (reference: LlamaBatch::finishRequest)."""
        slot = self.slots[slot_idx]
        if slot is None:
            return
        self.stats['canceled' if status == ResponseType.CANCELED
                   else 'finished'] += 1
        # snapshot RNG key for reproducible continuation (host copy from
        # the current substep's readback plane; device fetch only if this
        # slot never ran a round — _rng_now's row would belong to a prior
        # occupant)
        if self._rng_now is not None and slot.saw_round:
            slot.seq.rng_key = self._rng_now[slot_idx]
        else:
            slot.seq.rng_key = np.asarray(
                self.state.sampling.rng_key[slot_idx])
        self.state = self.fns.clear_slot(self.state, slot_idx)
        if self.ecfg.enable_prefix_caching:
            # publish the session's full KV pages into the prefix index
            # (unbound from the slot now, so page adoption is safe even
            # though erase may free the rest) — future sessions sharing
            # the prompt prefix skip its prefill entirely
            self.seqs.release(slot.seq)
            self.seqs.publish(slot.seq)
        if slot.request.sequence_end:
            self.seqs.erase(slot.request.session_id)
        else:
            self.seqs.release(slot.seq)
        self.slots[slot_idx] = None


def _get_or_dead(out_q: queue.Queue, engine: TPUEngine) -> EngineOutput:
    """Wait for the next output frame, but never past the engine's
    death: a client blocked on a queue the engine thread will no longer
    feed (shutdown or a crash bug) gets INTERNAL_ERROR instead of
    hanging forever."""
    while True:
        try:
            return out_q.get(timeout=1.0)
        except queue.Empty:
            alive = getattr(engine, 'alive', None)
            # engines without a liveness probe (RouterEngine wrapping
            # remote backends) just keep waiting — their dead-peer
            # fail-fast lives in the transport layer
            if alive is not None and not alive():
                return EngineOutput(ResponseType.INTERNAL_ERROR, [], 0,
                                    finished=True)


class EngineInstance:
    """Per-frontend handle (reference: TurboMindInstance)."""

    def __init__(self, engine: TPUEngine):
        self.engine = engine

    def stream_infer(self, session_id: int, input_ids,
                     gen_config: Optional[GenerationConfig] = None,
                     sequence_start: bool = True, sequence_end: bool = False,
                     step: int = 0):
        """Blocking generator of EngineOutput (incremental token lists)."""
        req = EngineRequest(
            session_id=session_id, input_ids=list(map(int, input_ids)),
            gen_config=gen_config or GenerationConfig(),
            sequence_start=sequence_start, sequence_end=sequence_end,
            step=step)
        out_q = self.engine.submit(req)
        while True:
            out = _get_or_dead(out_q, self.engine)
            yield out
            if out.finished:
                return

    async def async_stream_infer(self, session_id: int, input_ids,
                                 gen_config: Optional[GenerationConfig] = None,
                                 sequence_start: bool = True,
                                 sequence_end: bool = False, step: int = 0):
        """Async generator over EngineOutput (reference:
        TurboMindInstance.async_stream_infer, turbomind.py:211)."""
        import asyncio
        req = EngineRequest(
            session_id=session_id, input_ids=list(map(int, input_ids)),
            gen_config=gen_config or GenerationConfig(),
            sequence_start=sequence_start, sequence_end=sequence_end,
            step=step)
        out_q = self.engine.submit(req)
        loop = asyncio.get_running_loop()
        while True:
            out: EngineOutput = await loop.run_in_executor(
                None, _get_or_dead, out_q, self.engine)
            yield out
            if out.finished:
                return

    def infer(self, session_id: int, input_ids, **kw) -> EngineOutput:
        last = None
        for last in self.stream_infer(session_id, input_ids, **kw):
            pass
        return last

    def cancel(self, session_id: int):
        self.engine.cancel(session_id)

    def end(self, session_id: int):
        self.engine.end_session(session_id)

    def decode(self, input_ids) -> np.ndarray:
        """Prompt logits for PPL evaluation (reference:
        TurboMindInstance.decode, turbomind.py:364-411). Runs on the
        engine thread to serialize with decode rounds."""
        req = EngineRequest(session_id=-1, input_ids=list(map(int, input_ids)),
                            gen_config=GenerationConfig(), return_logits=True)
        out = _get_or_dead(self.engine.submit(req), self.engine)
        if out.logits is None:
            raise RuntimeError(f'decode failed: {out.status!r}')
        return out.logits


__all__ = ['TPUEngine', 'EngineInstance']
