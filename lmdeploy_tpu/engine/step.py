"""Device-side engine state and compiled step functions.

The generation hot loop of the reference (LlamaBatch::generate,
LlamaBatch.cc:470-559 — embedding lookup, decoder forward, lm_head,
dynamicDecode, finished-flag D2H) compiled into ONE jitted function over
fixed [B] batch slots.  Slot admission / retirement are small jitted
state-surgery functions (the reference's initialize/finish host code,
LlamaBatch.cc:561-762,929-1020) — XLA donation keeps the big buffers
in place.

Design note (SURVEY.md §7 hard parts): the batch is a fixed-shape ring of
slots; finished or empty slots keep running fully masked (valid=False so
their KV writes drop, sampling ignored) exactly like the reference keeps
retired slots in the batch until compaction.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from ..config import ModelConfig
from ..kvcache.paged import KVCache
from ..models.llama import StepBatch, forward, mask_vocab_padding
from ..ops.sampling import SamplingState, check_stop, sample_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class DecodeState:
    """Per-slot device state. Invariants for a running slot:
    history[:history_len] holds prompt+generated tokens;
    tokens == history[history_len-1] (next token to feed);
    context_len == history_len - 1 == tokens whose KV is cached."""
    tokens: jnp.ndarray        # int32 [B]
    context_len: jnp.ndarray   # int32 [B]
    history: jnp.ndarray       # int32 [B, S_hist]
    history_len: jnp.ndarray   # int32 [B]
    generated: jnp.ndarray     # int32 [B]
    active: jnp.ndarray        # bool  [B]
    finished: jnp.ndarray      # bool  [B]
    page_table: jnp.ndarray    # int32 [B, MAXP]
    sampling: SamplingState


def init_decode_state(batch: int, max_pages: int, hist_len: int,
                      eos_id: int = 2) -> DecodeState:
    return DecodeState(
        tokens=jnp.zeros((batch,), jnp.int32),
        context_len=jnp.zeros((batch,), jnp.int32),
        history=jnp.zeros((batch, hist_len), jnp.int32),
        history_len=jnp.zeros((batch,), jnp.int32),
        generated=jnp.zeros((batch,), jnp.int32),
        active=jnp.zeros((batch,), bool),
        finished=jnp.zeros((batch,), bool),
        page_table=jnp.full((batch, max_pages), -1, jnp.int32),
        sampling=SamplingState.init(batch, eos_id=eos_id),
    )


# ---------------------------------------------------------------------------
# hot loop
# ---------------------------------------------------------------------------

def decode_step(params: Dict[str, Any], cache: KVCache, state: DecodeState,
                cfg: ModelConfig, *, use_pallas_attn: bool = False,
                axis: str = None, sampling_mode: str = 'candidates',
                topn: int = 0, forward_fn=None):
    """One generation step for every running slot.

    ``sampling_mode`` is static — the host scheduler knows every running
    slot's GenerationConfig and picks 'greedy' / 'candidates' / 'full'
    per round (see ops/sampling.py).  ``topn`` is static: > 0 requests
    per-step top-``topn`` alternative tokens + logprobs (the OpenAI
    ``top_logprobs`` field for generated tokens).

    Returns (new_cache, new_state, sampled_tokens [B], finished [B],
    token_logprob [B], tops) where tops is (top_ids [B, topn],
    top_lps [B, topn]) or None.
    """
    b = state.tokens.shape[0]
    run = state.active & ~state.finished
    batch = StepBatch(
        ids=state.tokens[:, None],
        positions=state.context_len[:, None],
        valid=run[:, None],
        context_len=state.context_len + 1,
        page_table=state.page_table,
    )
    fwd = forward_fn or forward
    logits, cache = fwd(params, cache, batch, cfg, axis=axis,
                        use_pallas_attn=use_pallas_attn)
    logits = mask_vocab_padding(logits, cfg.vocab_size)
    sampled = sample_step(
        logits, state.sampling, state.history, state.history_len,
        state.generated, run=run, mode=sampling_mode, topn=topn)
    new_tok, new_keys, logprob = sampled[:3]
    tops = sampled[3] if topn > 0 else None
    new_tok = jnp.where(run, new_tok, state.tokens)
    generated = state.generated + run.astype(jnp.int32)
    fin_now = check_stop(new_tok, state.sampling, generated) & run
    finished = state.finished | fin_now
    hist_idx = jnp.where(run, state.history_len,
                         jnp.int32(state.history.shape[1]))
    history = state.history.at[jnp.arange(b), hist_idx].set(
        new_tok, mode='drop')
    inc = run.astype(jnp.int32)
    sampling = dataclasses.replace(
        state.sampling,
        rng_key=jnp.where(run[:, None], new_keys, state.sampling.rng_key))
    new_state = dataclasses.replace(
        state, tokens=new_tok, context_len=state.context_len + inc,
        history=history, history_len=state.history_len + inc,
        generated=generated, finished=finished, sampling=sampling)
    if topn > 0:
        return cache, new_state, new_tok, finished, logprob, tops
    return cache, new_state, new_tok, finished, logprob


def decode_steps(params, cache: KVCache, state: DecodeState,
                 cfg: ModelConfig, *, num_steps: int,
                 use_pallas_attn: bool = False, axis: str = None,
                 sampling_mode: str = 'candidates', topn: int = 0,
                 forward_fn=None):
    """``num_steps`` generation steps in ONE device program (the reference's
    step_length knob, LlamaV2.cc internal loop).  Amortizes the host
    dispatch + readback round-trip — critical when the host↔device link
    is high-latency.  Finished slots keep running masked; the host sees
    per-substep tokens/finished flags packed into one [5, k, B] transfer.

    Returns (cache, state, packed int32 [5 + 2*topn, k, B], logprobs f32
    [k, B]).  Packed rows: (tokens; finished; logprob bits; rng word0;
    rng word1), then with ``topn`` > 0 the per-step top-``topn``
    alternative token ids ([5:5+topn]) and their logprob f32 bits
    ([5+topn:5+2*topn]) — ONE host transfer still carries everything.
    The per-substep RNG planes let the host snapshot a slot's key at the
    exact substep it stopped (reference: curand state save,
    LlamaBatch.cc:1097) — a slot retired mid-round by a host-side stop
    sequence must not save a key that advanced past the stop point.
    """
    def body(carry, _):
        cache, state = carry
        stepped = decode_step(
            params, cache, state, cfg, use_pallas_attn=use_pallas_attn,
            axis=axis, sampling_mode=sampling_mode, topn=topn,
            forward_fn=forward_fn)
        cache, state, tok, fin, logprob = stepped[:5]
        tops = stepped[5] if topn > 0 else (
            jnp.zeros((tok.shape[0], 0), jnp.int32),
            jnp.zeros((tok.shape[0], 0), jnp.float32))
        return (cache, state), (tok, fin, logprob,
                                state.sampling.rng_key, tops)

    (cache, state), (toks, fins, logprobs, rngs, tops) = jax.lax.scan(
        body, (cache, state), length=num_steps)
    # logprob plane: f32 bits (reference logprob kernels, logprob_kernels.cu)
    lp = jax.lax.bitcast_convert_type(logprobs.astype(jnp.float32),
                                      jnp.int32)                  # [k, B]
    # rngs [k, B, 2] uint32 -> two [k, B] int32 planes
    rng = jax.lax.bitcast_convert_type(rngs, jnp.int32)
    planes = [toks, fins.astype(jnp.int32), lp,
              rng[..., 0], rng[..., 1]]                           # 5x [k, B]
    if topn > 0:
        tid, tlp = tops                                  # [k, B, topn]
        planes += list(jnp.moveaxis(tid, 2, 0))
        planes += list(jnp.moveaxis(jax.lax.bitcast_convert_type(
            tlp.astype(jnp.float32), jnp.int32), 2, 0))
    packed = jnp.stack(planes)                       # [5 + 2*topn, k, B]
    return cache, state, packed, logprobs


# ---------------------------------------------------------------------------
# speculative decoding (greedy prompt-lookup) — beyond-reference
# ---------------------------------------------------------------------------

def spec_decode_round(params, cache: KVCache, state: DecodeState,
                      cfg: ModelConfig, *, k_draft: int, ngram: int = 3,
                      ngram_min: int = 0, use_pallas_attn: bool = False,
                      axis: str = None, sampling: str = 'greedy',
                      topn: int = 0, forward_fn=None):
    """One speculative round for every running slot: propose ``k_draft``
    tokens by in-jit prompt lookup, verify all of them plus the model's
    own next token in ONE [B, K+1]-position forward, accept the matched
    prefix.  bs1 decode is weight-bandwidth-bound, so the verify streams
    the same bytes as a single decode step — rejected drafts are nearly
    free (ops/speculative.py).

    ``topn`` (STATIC) > 0 additionally returns per-position top-``topn``
    alternative tokens + logprobs (sample_step's OpenAI top_logprobs
    convention: pre-filter distribution, the reported token logprob
    equals the chosen token's own top_logprobs entry), so
    logprob-requesting slots keep riding speculation.

    ``sampling`` is static, chosen by the host like decode_step's mode:
      * 'greedy'     — raw-argmax verify (every slot is plain greedy).
      * 'candidates' — exact rejection sampling against the full
        processed distribution (top-1024 candidate pipeline); serves
        mixed greedy/sampled batches, greedy slots stay token-identical.
      * 'full'       — same but with the exact full-vocab sort, for
        batches containing top_k<=0 slots.

    Returns (cache, state, g [B, K+1] candidate tokens, fin_emit
    [B, K+1] finish flag per emitted token, n [B] tokens emitted,
    logp [B, K+1], tops) where tops is (top_ids [B, K+1, topn],
    top_lps [B, K+1, topn]) or None.
    """
    from ..ops.speculative import (greedy_argmax, ngram_propose,
                                   spec_verify_sample)

    b = state.tokens.shape[0]
    kp1 = k_draft + 1
    cap = state.history.shape[1]
    run = state.active & ~state.finished
    draft = ngram_propose(state.history, state.history_len, k_draft,
                          ngram, ngram_min)                   # [B, K]
    ids = jnp.concatenate([state.tokens[:, None], draft], axis=1)
    t_idx = jnp.arange(kp1, dtype=jnp.int32)[None]
    pos = state.context_len[:, None] + t_idx                  # [B, K+1]
    valid = run[:, None] & (pos < cap)
    batch = StepBatch(
        ids=ids, positions=pos, valid=valid,
        context_len=jnp.minimum(state.context_len + kp1, cap),
        page_table=state.page_table)
    fwd = forward_fn or forward
    logits, cache = fwd(params, cache, batch, cfg,
                        return_all_logits=True, logits_count=kp1,
                        axis=axis, use_pallas_attn=use_pallas_attn)
    logits = mask_vocab_padding(logits, cfg.vocab_size)       # [B,K+1,V]

    smp = state.sampling
    # keys advance once per round in every mode (greedy consumes no
    # randomness; sampled rounds burn one key's worth of draws)
    keys = jax.vmap(jax.random.wrap_key_data)(smp.rng_key)
    split = jax.vmap(jax.random.split)(keys)                  # [B, 2]
    new_keys = jax.vmap(jax.random.key_data)(split[:, 0])
    tops = None
    if sampling == 'greedy':
        g = greedy_argmax(logits)                             # [B, K+1]
        match = (draft == g[:, :-1]) & run[:, None]           # [B, K]
        if topn > 0:
            # sample_step's greedy+topn branch, vectorized over K+1:
            # alternatives from the report-basis distribution
            # (temperature-scaled; temp ~ 0 reports at 1.0 — ops/
            # sampling.py report_temperature); the argmax IS top-1 of
            # that same distribution so the reported logprob equals its
            # own top_logprobs entry
            from ..ops.sampling import report_temperature
            lgf = logits.astype(jnp.float32).reshape(b * kp1, -1)
            tv = lgf / report_temperature(
                jnp.repeat(smp.temperature, kp1))[:, None]
            top_vals, top_idx = jax.lax.top_k(tv, topn)
            tlp = top_vals - jax.nn.logsumexp(tv, axis=-1, keepdims=True)
            tops = (top_idx.reshape(b, kp1, topn).astype(jnp.int32),
                    tlp.reshape(b, kp1, topn))
            logp = tops[1][..., 0]
        else:
            # a top_k==1 post-filter candidate set is {argmax}: logprob 0
            logp = jnp.zeros(g.shape, jnp.float32)
    elif topn > 0:
        g, accept, logp, tops = spec_verify_sample(
            logits, draft, smp, state.history, state.history_len,
            state.generated, split[:, 1], mode=sampling, topn=topn)
        match = accept & run[:, None]                         # [B, K]
    else:
        g, accept, logp = spec_verify_sample(
            logits, draft, smp, state.history, state.history_len,
            state.generated, split[:, 1], mode=sampling)
        match = accept & run[:, None]                         # [B, K]
    acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    cand = jnp.arange(kp1)[None] <= acc[:, None]              # [B, K+1]
    # positions past the session cap can never be emitted
    cand &= pos[:, :kp1] < cap
    gen_at = state.generated[:, None] + jnp.arange(kp1)[None] + 1
    is_eos = (g == smp.eos_id[:, None]) & ~smp.ignore_eos[:, None]
    is_stop = jnp.any(g[:, :, None] == smp.stop_words[:, None, :], axis=2)
    too_long = gen_at >= smp.max_new_tokens[:, None]
    fin_t = is_eos | is_stop | too_long                       # [B, K+1]
    # a token is emitted iff it's an accepted candidate and no earlier
    # emitted token already finished the slot
    before_fin = jnp.cumsum((fin_t & cand).astype(jnp.int32), axis=1) \
        - (fin_t & cand).astype(jnp.int32)
    emit = cand & (before_fin == 0)
    n = jnp.where(run, jnp.sum(emit.astype(jnp.int32), axis=1), 0)
    fin_emit = emit & fin_t

    last_idx = jnp.maximum(n - 1, 0)
    new_tok = jnp.take_along_axis(g, last_idx[:, None], axis=1)[:, 0]
    new_tok = jnp.where(run & (n > 0), new_tok, state.tokens)
    hist_pos = state.history_len[:, None] + jnp.arange(kp1)[None]
    write_idx = jnp.where(emit, hist_pos, cap)
    history = state.history.at[
        jnp.arange(b)[:, None], write_idx].set(g, mode='drop')
    finished = state.finished | jnp.any(fin_emit, axis=1)
    new_smp = dataclasses.replace(
        smp, rng_key=jnp.where(run[:, None], new_keys, smp.rng_key))
    new_state = dataclasses.replace(
        state, tokens=new_tok, context_len=state.context_len + n,
        history=history, history_len=state.history_len + n,
        generated=state.generated + n, finished=finished,
        sampling=new_smp)
    return cache, new_state, g, fin_emit, n, logp, tops


def spec_decode_rounds(params, cache: KVCache, state: DecodeState,
                       cfg: ModelConfig, *, num_rounds: int, k_draft: int,
                       ngram: int = 3, ngram_min: int = 0,
                       use_pallas_attn: bool = False,
                       axis: str = None, sampling: str = 'greedy',
                       topn: int = 0, forward_fn=None):
    """``num_rounds`` speculative rounds in one device program.

    Returns (cache, state, packed int32 [R, 3*(K+1)+3 + 2*(K+1)*topn, B]):
    per round, rows [0:K+1] = candidate tokens, rows [K+1:2K+2] =
    per-token finish flags, row 2K+2 = emitted count, rows [2K+3:3K+4] =
    per-token logprob f32 bits (the plain path's logprob stream,
    logprob_kernels.cu analogue), rows [3K+4:3K+6] = the rng key AFTER
    this round (per-round snapshot: a slot retired mid-dispatch by a
    host-side stop sequence must save the key as of ITS round, matching
    decode_steps' per-substep rng planes / the reference's curand save at
    the exact stop step, LlamaBatch.cc:1097); with ``topn`` > 0 the
    top-N alternative token ids ([(K+1)*topn] rows, position-major) and
    their logprob f32 bits follow — ONE host transfer still carries the
    whole round, so top_logprobs requests keep speculation.
    """
    kp1 = k_draft + 1

    def body(carry, _):
        cache, state = carry
        cache, state, g, fin_emit, n, logp, tops = spec_decode_round(
            params, cache, state, cfg, k_draft=k_draft, ngram=ngram,
            ngram_min=ngram_min, use_pallas_attn=use_pallas_attn,
            axis=axis, sampling=sampling, topn=topn,
            forward_fn=forward_fn)
        rng = jax.lax.bitcast_convert_type(state.sampling.rng_key,
                                           jnp.int32).T        # [2, B]
        lp = jax.lax.bitcast_convert_type(logp.astype(jnp.float32),
                                          jnp.int32).T         # [kp1, B]
        planes = [g.T, fin_emit.astype(jnp.int32).T, n[None], lp, rng]
        if topn > 0:
            tid, tlp = tops                          # [B, kp1, topn]
            b = tid.shape[0]
            planes.append(
                tid.transpose(1, 2, 0).reshape(kp1 * topn, b))
            planes.append(jax.lax.bitcast_convert_type(
                tlp.astype(jnp.float32), jnp.int32)
                .transpose(1, 2, 0).reshape(kp1 * topn, b))
        row = jnp.concatenate(planes, axis=0)
        return (cache, state), row

    (cache, state), packed = jax.lax.scan(body, (cache, state),
                                          length=num_rounds)
    return cache, state, packed


# ---------------------------------------------------------------------------
# prefill
# ---------------------------------------------------------------------------

def prefill_chunk(params, cache: KVCache, state: DecodeState, slot,
                  ids, start_pos, length, cfg: ModelConfig, *,
                  use_pallas_attn: bool = False, axis: str = None,
                  dp_axis: str = None, forward_fn=None):
    """Append one padded prompt chunk of a single slot into the KV cache.

    Args:
      slot: int32 scalar GLOBAL batch-slot index.
      ids: int32 [T_bucket] (padded) chunk token ids.
      start_pos: int32 scalar absolute position of ids[0].
      length: int32 scalar number of valid tokens in the chunk.
      dp_axis: when running under shard_map with the batch and page pool
        sharded over this axis, the slot's owning group is
        slot // local_batch — only that group's shard performs the KV
        writes (pool-local page ids), the others run fully masked.  This
        is the per-group prefill routing of the dp-sharded engine.
    Returns (cache, last_logits [V]) — logits of the last valid token,
    used only by the logits/PPL path (garbage on non-owner dp shards).
    """
    t = ids.shape[0]
    pos = start_pos + jnp.arange(t, dtype=jnp.int32)
    valid = jnp.arange(t) < length
    if dp_axis is not None:
        local_batch = state.tokens.shape[0]  # per-group block under shard_map
        group = slot // local_batch
        local_slot = slot - group * local_batch
        valid = valid & (jax.lax.axis_index(dp_axis) == group)
        row = state.page_table[local_slot]
    else:
        row = state.page_table[slot]
    batch = StepBatch(
        ids=ids[None],
        positions=pos[None],
        valid=valid[None],
        context_len=(start_pos + length)[None],
        page_table=row[None],
    )
    fwd = forward_fn or forward
    logits, cache = fwd(params, cache, batch, cfg, axis=axis,
                        use_pallas_attn=use_pallas_attn)
    return cache, logits[0]


def prefill_chunks(params, cache: KVCache, state: DecodeState, slots,
                   ids, start_pos, lengths, cfg: ModelConfig, *,
                   use_pallas_attn: bool = False, axis: str = None,
                   dp_axis: str = None, forward_fn=None):
    """Batched multi-slot prefill: one device pass appends one chunk for
    EVERY newly admitted slot (the reference's batched context decode,
    LlamaBatch.cc:795-858 — concurrent admissions must not serialize
    their TTFT).

    Args:
      slots: int32 [Bp] GLOBAL batch-slot indices (padding rows allowed:
        use any slot with length 0 — fully masked).
      ids: int32 [Bp, T_bucket] padded chunk token ids.
      start_pos: int32 [Bp] absolute position of each row's ids[0].
      lengths: int32 [Bp] valid tokens per row.
    Returns (cache, last_logits [Bp, V]) — logits of each row's last
    valid token (garbage for padding rows / non-owner dp shards).
    """
    bp, t = ids.shape
    pos = start_pos[:, None] + jnp.arange(t, dtype=jnp.int32)[None]
    valid = jnp.arange(t)[None] < lengths[:, None]
    if dp_axis is not None:
        local_batch = state.tokens.shape[0]  # per-group block
        group = slots // local_batch
        local_slots = slots - group * local_batch
        valid = valid & (jax.lax.axis_index(dp_axis) == group)[:, None]
        rows = state.page_table[local_slots]
    else:
        rows = state.page_table[slots]
    batch = StepBatch(
        ids=ids,
        positions=pos,
        valid=valid,
        context_len=start_pos + lengths,
        page_table=rows,
    )
    fwd = forward_fn or forward
    logits, cache = fwd(params, cache, batch, cfg, axis=axis,
                        use_pallas_attn=use_pallas_attn)
    return cache, logits


def prefill_logits(params, cache: KVCache, page_row, ids, start_pos, length,
                   cfg: ModelConfig, *, axis: str = None,
                   dp_axis: str = None, forward_fn=None):
    """Like prefill_chunk but returns logits for ALL positions of the chunk
    (the reference's is_return_logits path, LlamaBatch::outputContextLogits).
    Takes a standalone page-table row so it never touches DecodeState.

    Under a dp-sharded cache (``dp_axis``) the scratch pages live in
    group 0's pool shard: writes are masked to group 0 and the logits are
    psum-selected from it so every shard returns the same values.
    """
    t = ids.shape[0]
    pos = start_pos + jnp.arange(t, dtype=jnp.int32)
    valid = jnp.arange(t) < length
    if dp_axis is not None:
        is_owner = jax.lax.axis_index(dp_axis) == 0
        valid = valid & is_owner
    batch = StepBatch(
        ids=ids[None],
        positions=pos[None],
        valid=valid[None],
        context_len=(start_pos + length)[None],
        page_table=page_row[None],
    )
    fwd = forward_fn or forward
    logits, cache = fwd(params, cache, batch, cfg,
                        return_all_logits=True, axis=axis)
    if dp_axis is not None:
        logits = jax.lax.psum(
            jnp.where(is_owner, logits, 0.0), dp_axis)
    return cache, logits[0]


# ---------------------------------------------------------------------------
# slot surgery (admission / retirement / control)
# ---------------------------------------------------------------------------

def install_slot(state: DecodeState, slot, token, context_len, history_row,
                 history_len, page_row, sampling_row: SamplingState
                 ) -> DecodeState:
    """Bind a request to batch slot ``slot`` (reference:
    LlamaBatch::initialize + initializeSampling for one index)."""
    sampling = jax.tree.map(lambda full, row: full.at[slot].set(row),
                            state.sampling, sampling_row)
    return dataclasses.replace(
        state,
        tokens=state.tokens.at[slot].set(token),
        context_len=state.context_len.at[slot].set(context_len),
        history=state.history.at[slot].set(history_row),
        history_len=state.history_len.at[slot].set(history_len),
        generated=state.generated.at[slot].set(0),
        active=state.active.at[slot].set(True),
        finished=state.finished.at[slot].set(False),
        page_table=state.page_table.at[slot].set(page_row),
        sampling=sampling,
    )


def clear_slot(state: DecodeState, slot) -> DecodeState:
    return dataclasses.replace(
        state,
        active=state.active.at[slot].set(False),
        finished=state.finished.at[slot].set(True),
    )


def set_finished(state: DecodeState, slot) -> DecodeState:
    """Host-initiated stop (cancel / multi-token stop word hit)."""
    return dataclasses.replace(
        state, finished=state.finished.at[slot].set(True))


def set_active(state: DecodeState, slot, value) -> DecodeState:
    """(De)activate a slot: admitted-but-still-prefilling slots sit
    inactive so decode rounds interleaved between prefill chunk passes
    never touch their unwritten KV."""
    return dataclasses.replace(
        state, active=state.active.at[slot].set(value))


def set_page_row(state: DecodeState, slot, page_row) -> DecodeState:
    return dataclasses.replace(
        state, page_table=state.page_table.at[slot].set(page_row))


class CompiledStepFns:
    """Holds jit-compiled step functions for one (cfg, shapes) setup.

    Buffer donation keeps cache/state updates in-place on device; bucketed
    prefill avoids recompiles across prompt lengths.
    """

    def __init__(self, cfg: ModelConfig, *, use_pallas_attn: bool = False,
                 axis: str = None):
        self.cfg = cfg
        kw = dict(cfg=cfg, use_pallas_attn=use_pallas_attn, axis=axis)
        self.decode_step = jax.jit(
            partial(decode_step, **kw), donate_argnums=(1, 2),
            static_argnames=('sampling_mode', 'topn'))
        self.decode_steps = jax.jit(
            partial(decode_steps, **kw), donate_argnums=(1, 2),
            static_argnames=('num_steps', 'sampling_mode', 'topn'))
        self.spec_decode_rounds = jax.jit(
            partial(spec_decode_rounds, **kw), donate_argnums=(1, 2),
            static_argnames=('num_rounds', 'k_draft', 'ngram',
                             'ngram_min', 'sampling', 'topn'))
        self.prefill_chunk = jax.jit(
            partial(prefill_chunk, **kw), donate_argnums=(1,))
        self.prefill_chunks = jax.jit(
            partial(prefill_chunks, **kw), donate_argnums=(1,))
        self.prefill_logits_row = jax.jit(
            partial(prefill_logits, cfg=cfg, axis=axis), donate_argnums=(1,))
        self.install_slot = jax.jit(install_slot, donate_argnums=(0,))
        self.clear_slot = jax.jit(clear_slot, donate_argnums=(0,))
        self.set_finished = jax.jit(set_finished, donate_argnums=(0,))
        self.set_active = jax.jit(set_active, donate_argnums=(0,))
        self.set_page_row = jax.jit(set_page_row, donate_argnums=(0,))


__all__ = ['DecodeState', 'init_decode_state', 'decode_step', 'prefill_chunk',
           'prefill_chunks', 'prefill_logits', 'install_slot', 'clear_slot',
           'set_finished', 'set_active', 'set_page_row', 'CompiledStepFns']
