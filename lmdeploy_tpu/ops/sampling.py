"""Batched sampling pipeline — the TPU-native DynamicDecodeLayer.

Reference: src/turbomind/layers/DynamicDecodeLayer.cc:146-239 runs
ban-bad-words -> min-length EOS mask -> repetition penalty -> top-k ->
top-p -> stop/length criteria as separate CUDA kernels with curand state
per slot.  Here the whole pipeline is one jittable function over fixed
[B] batch slots; per-slot randomness uses JAX PRNG keys stored as plain
data (replacing curand state save/restore, LlamaBatch.cc:363-377 — keys
snapshot/restore across turns for free because they are just arrays).

Everything is fully vectorized: per-slot top_k/top_p/temperature etc. are
[B] arrays; disabled features are identity (k=0 -> no top-k, p=1 -> no
top-p, penalty=1 -> no penalty), so one compiled program serves any mix.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30
MAX_TOPK = 1024  # reference clips top_k to 1024 likewise
MAX_STOP_BAD_WORDS = 32  # reference kMaxStopBadWordsLen (gpt_kernels.h)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingState:
    """Per-slot sampling parameters and RNG keys (all leading dim [B])."""
    top_k: jnp.ndarray              # int32 [B]; 0 disables
    top_p: jnp.ndarray              # f32 [B]; 1.0 disables
    min_p: jnp.ndarray              # f32 [B]; 0.0 disables
    temperature: jnp.ndarray        # f32 [B]
    repetition_penalty: jnp.ndarray  # f32 [B]; 1.0 disables
    presence_penalty: jnp.ndarray   # f32 [B]; 0.0 disables (additive)
    frequency_penalty: jnp.ndarray  # f32 [B]; 0.0 disables (count-scaled)
    rng_key: jnp.ndarray            # uint32 [B, 2] (threefry key data)
    bad_words: jnp.ndarray          # int32 [B, MAX_BAD]; pad with -1
    stop_words: jnp.ndarray         # int32 [B, MAX_STOP]; pad with -1
    eos_id: jnp.ndarray             # int32 [B]
    ignore_eos: jnp.ndarray         # bool [B]
    min_new_tokens: jnp.ndarray     # int32 [B]
    max_new_tokens: jnp.ndarray     # int32 [B]

    @staticmethod
    def init(batch: int, max_bad: int = MAX_STOP_BAD_WORDS,
             max_stop: int = MAX_STOP_BAD_WORDS,
             eos_id: int = 2) -> 'SamplingState':
        return SamplingState(
            top_k=jnp.zeros((batch,), jnp.int32),
            top_p=jnp.ones((batch,), jnp.float32),
            min_p=jnp.zeros((batch,), jnp.float32),
            temperature=jnp.ones((batch,), jnp.float32),
            repetition_penalty=jnp.ones((batch,), jnp.float32),
            presence_penalty=jnp.zeros((batch,), jnp.float32),
            frequency_penalty=jnp.zeros((batch,), jnp.float32),
            rng_key=jnp.zeros((batch, 2), jnp.uint32),
            bad_words=jnp.full((batch, max_bad), -1, jnp.int32),
            stop_words=jnp.full((batch, max_stop), -1, jnp.int32),
            eos_id=jnp.full((batch,), eos_id, jnp.int32),
            ignore_eos=jnp.zeros((batch,), bool),
            min_new_tokens=jnp.zeros((batch,), jnp.int32),
            max_new_tokens=jnp.full((batch,), 512, jnp.int32),
        )


def apply_repetition_penalty(logits, history, history_len, penalty,
                             presence=None, frequency=None, gen_start=None):
    """Divide positive / multiply negative logits of previously seen tokens
    (reference: sampling_penalty_kernels.cu repetition penalty over the full
    output-id history including the prompt).  ``presence`` and
    ``frequency`` are the OpenAI additive penalties: a flat / per-count
    subtraction from each seen token's logit, counted over GENERATED
    tokens only (the OpenAI/vLLM contract these API fields implement —
    a long prompt must not pre-penalize its own vocabulary), selected by
    ``gen_start`` (= history_len - generated).  The reference's own
    Additive repetition variant (sampling_penalty_kernels.cu:255-258)
    covers the prompt too; we follow the API the field names promise.

    Args:
      logits: f32 [B, V]
      history: int32 [B, S] token ids (prompt + generated), padded arbitrarily
      history_len: int32 [B] number of valid entries in ``history``
      penalty: f32 [B] multiplicative (1.0 = off), over the FULL history
      presence: f32 [B] additive (0.0 = off) or None
      frequency: f32 [B] per-count additive (0.0 = off) or None
      gen_start: int32 [B] index of the first generated token in
        ``history`` (None = 0: count everything, test/back-compat path)
    """
    b, v = logits.shape
    s = history.shape[1]
    pos = jax.lax.broadcasted_iota(jnp.int32, (b, s), 1)
    valid = pos < history_len[:, None]
    rows = jnp.arange(b)[:, None]
    idx = jnp.where(valid, history, v)  # out-of-range rows drop
    seen = jnp.zeros((b, v), jnp.bool_).at[rows, idx].max(valid, mode='drop')
    pen = penalty[:, None]
    out = jnp.where(seen & (pen != 1.0),
                    jnp.where(logits > 0, logits / pen, logits * pen),
                    logits)
    if presence is not None or frequency is not None:
        gen_valid = valid if gen_start is None \
            else valid & (pos >= gen_start[:, None])
        gen_idx = jnp.where(gen_valid, history, v)
        counts = jnp.zeros((b, v), jnp.float32).at[rows, gen_idx].add(
            gen_valid.astype(jnp.float32), mode='drop')
        sub = jnp.zeros((b, 1), jnp.float32)
        if presence is not None:
            sub = sub + presence[:, None] * (counts > 0)
        if frequency is not None:
            sub = sub + frequency[:, None] * counts
        out = out - sub
    return out


def ban_words(logits, word_ids):
    """Set banned token ids to -inf. word_ids int32 [B, W], -1 padded."""
    b, v = logits.shape
    idx = jnp.where(word_ids >= 0, word_ids, v)
    return logits.at[jnp.arange(b)[:, None], idx].set(NEG_INF, mode='drop')


def mask_eos_below_min_len(logits, eos_id, generated, min_new_tokens):
    """Forbid EOS until min_new_tokens generated (reference min-length mask)."""
    b, v = logits.shape
    block = generated < min_new_tokens
    idx = jnp.where(block, eos_id, v)
    return logits.at[jnp.arange(b), idx].set(NEG_INF, mode='drop')


# ---------------------------------------------------------------------------
# Reference oracles.  top_k_mask / top_p_mask / min_p_mask are the
# full-vocab [B, V] definitions of the three filters, kept as the golden
# models that tests/test_sampling.py checks `sample_step` against (the
# reference's kernel-vs-naive test style, tests/csrc/unittests).  The hot
# path in `sample_step` intentionally reimplements them on the sorted
# top-C candidate representation — one top_k sort feeds all three filters,
# which is the entire point of the candidates pipeline; do NOT "reuse"
# these here (each would re-sort or re-scatter the full vocab).
# ---------------------------------------------------------------------------

def top_k_mask(logits, k):
    """Keep the k largest per row; k<=0 disables. Vectorized over mixed k."""
    b, v = logits.shape
    kk = jnp.clip(k, 0, min(MAX_TOPK, v))
    top_vals = jax.lax.top_k(logits, min(MAX_TOPK, v))[0]  # [B, MAX_TOPK]
    kth = jnp.take_along_axis(
        top_vals, jnp.maximum(kk - 1, 0)[:, None], axis=1)  # [B,1]
    keep = (logits >= kth) | (kk[:, None] <= 0)
    return jnp.where(keep, logits, NEG_INF)


def top_p_mask(logits, p):
    """Nucleus filtering; p>=1 disables. Keeps the smallest prefix of the
    descending-prob order whose mass reaches p (always >= 1 token)."""
    probs = jax.nn.softmax(logits, axis=-1)
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    cum = jnp.cumsum(sorted_probs, axis=-1)
    # Probability threshold: smallest prob still inside the nucleus.
    inside = (cum - sorted_probs) < p[:, None]
    thresh = jnp.min(jnp.where(inside, sorted_probs, jnp.inf),
                     axis=-1, keepdims=True)
    keep = (probs >= thresh) | (p[:, None] >= 1.0)
    return jnp.where(keep, logits, NEG_INF)


def min_p_mask(logits, min_p):
    """Drop tokens below min_p * max_prob; 0 disables."""
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = probs.max(axis=-1, keepdims=True) * min_p[:, None]
    keep = (probs >= cutoff) | (min_p[:, None] <= 0.0)
    return jnp.where(keep, logits, NEG_INF)


def report_temperature(t):
    """Reporting basis for the top-N logprob planes: an effectively-
    greedy slot (temperature ~ 0, clamped to 1e-5 upstream) reports at
    temperature 1.0 — the model's own distribution — instead of the
    degenerate point mass it samples from (vLLM's greedy-logprobs
    convention; OpenAI returns finite alternatives at temperature 0).
    Sampling itself NEVER uses this basis."""
    return jnp.where(t < 1e-3, 1.0, jnp.maximum(t, 1e-3))


def filter_candidates(vals, top_k, top_p, min_p):
    """Apply the top-k -> top-p -> min-p mask cascade to desc-sorted
    candidate logits ``vals`` [R, C] with per-row params [R].  One
    top-k sort upstream feeds all three filters — shared by
    ``sample_step`` and the speculative verify
    (ops/speculative.spec_verify_sample) so the two paths cannot
    drift."""
    c = vals.shape[-1]
    pos = jnp.arange(c)[None]
    kk = jnp.where(top_k <= 0, c, jnp.clip(top_k, 1, c))[:, None]
    vals = jnp.where(pos < kk, vals, NEG_INF)
    probs = jax.nn.softmax(vals, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    inside = (cum - probs) < top_p[:, None]     # keeps >= 1 token
    vals = jnp.where(inside, vals, NEG_INF)
    cutoff = probs[:, :1] * min_p[:, None]      # max prob is first
    return jnp.where((probs >= cutoff) | (min_p[:, None] <= 0.0),
                     vals, NEG_INF)


def _approx_topk() -> bool:
    """Blockwise candidates top-k (LMDEPLOY_TPU_APPROX_TOPK, default on;
    0 restores the exact full-vocab sort)."""
    import os
    return os.environ.get('LMDEPLOY_TPU_APPROX_TOPK', '1') == '1'


def sample_step(logits, state: SamplingState, history, history_len,
                generated, run=None, mode: str = 'candidates',
                topn: int = 0):
    """Run the full sampling pipeline for one decode step.

    Args:
      logits: f32/bf16 [B, V] raw lm_head output for the current position.
      state: SamplingState pytree of [B] parameters.
      history: int32 [B, S] all tokens so far (prompt + generated).
      history_len: int32 [B].
      generated: int32 [B] tokens generated so far for min-len masking.
      run: bool [B] slots actually decoding this step (None = all).
      mode: STATIC execution path, chosen by the host which knows every
        running slot's GenerationConfig (the reference likewise
        dispatches specialized kernels: TopK's k==1 shortcut, TopP's
        full-vocab sort — sampling_topk_kernels.cu /
        sampling_topp_kernels.cu).  A run-time lax.cond was measured 30%
        SLOWER end-to-end than the static split (both branch programs
        bloat the decode step).
        * 'greedy'     — every running slot has top_k == 1: one argmax.
        * 'candidates' — sorted top-1024 candidate pipeline (top_k
          clipped to 1024 like the reference).
        * 'full'       — EXACT full-vocab sorted pipeline for slots with
          top_k <= 0 (no top-1024 truncation of unconstrained sampling).
      topn: STATIC; when > 0 additionally return the top-``topn``
        alternative tokens and their logprobs per slot (the OpenAI
        ``top_logprobs`` field for GENERATED tokens; the reference's
        output_log_probs cum-log path carries the chosen token only).
        An effectively-greedy slot (temperature ~ 0) reports at
        temperature 1.0 (report_temperature; vLLM's convention — OpenAI
        returns finite alternatives at temperature 0).
        Alternatives come from the temperature-scaled processed
        distribution BEFORE the top-k/top-p/min-p cut — alternatives the
        filters would have rejected still get honest logprobs (OpenAI
        reports the model distribution, not the truncated sampler's).
    Returns:
      (tokens int32 [B], new_rng_key uint32 [B,2], token_logprob f32 [B])
      — plus (top_ids int32 [B, topn], top_lps f32 [B, topn]) when
      ``topn`` > 0.
    """
    b, v = logits.shape
    logits = logits.astype(jnp.float32)
    # full-vocab scatter passes run only when some slot enables them
    # (reference: BaseSamplingLayer skip logic) — lax.cond branches at
    # run time, so the common all-disabled case costs one predicate
    logits = jax.lax.cond(
        jnp.any(state.bad_words >= 0),
        lambda lg: ban_words(lg, state.bad_words), lambda lg: lg, logits)
    logits = mask_eos_below_min_len(logits, state.eos_id, generated,
                                    state.min_new_tokens)
    logits = jax.lax.cond(
        jnp.any(state.repetition_penalty != 1.0)
        | jnp.any(state.presence_penalty != 0.0)
        | jnp.any(state.frequency_penalty != 0.0),
        lambda lg: apply_repetition_penalty(lg, history, history_len,
                                            state.repetition_penalty,
                                            state.presence_penalty,
                                            state.frequency_penalty,
                                            gen_start=history_len - generated),
        lambda lg: lg, logits)

    # keys advance every step regardless of path so interleaving greedy
    # and sampled turns stays reproducible
    keys = jax.vmap(jax.random.wrap_key_data)(state.rng_key)
    split = jax.vmap(jax.random.split)(keys)  # [B, 2] keys
    new_keys = jax.vmap(jax.random.key_data)(split[:, 0])
    sample_keys = split[:, 1]

    if mode == 'greedy':
        # temperature / top-p / min-p cannot change an argmax; the
        # post-filter candidate set is {argmax}, so logprob is exactly 0.
        # The barrier stops XLA from fusing the reduce into the lm_head
        # matmul epilogue (fused argmax was a measured 45% WHOLE-ENGINE
        # regression on this backend).
        lg = jax.lax.optimization_barrier(logits)
        tokens = jnp.argmax(lg, axis=-1).astype(jnp.int32)
        zeros = jnp.zeros((b,), jnp.float32)
        if topn > 0:
            tv = lg / report_temperature(state.temperature)[:, None]
            top_vals, top_ids = jax.lax.top_k(tv, topn)
            top_lps = top_vals - jax.nn.logsumexp(tv, axis=-1,
                                                  keepdims=True)
            # OpenAI consistency: the reported token logprob must equal
            # that token's entry in top_logprobs — the argmax IS top-1
            # of the same distribution (the topn==0 path keeps the
            # post-filter 0.0 convention)
            return (tokens, new_keys, top_lps[:, 0],
                    (top_ids.astype(jnp.int32), top_lps))
        return tokens, new_keys, zeros

    c = v if (mode == 'full' or v <= MAX_TOPK) else MAX_TOPK
    lg = logits / jnp.maximum(state.temperature, 1e-5)[:, None]
    if mode == 'candidates' and c < v and _approx_topk():
        # TPU-native blockwise top-k (XLA ApproxTopK PartialReduce):
        # coarse per-tile reduction + exact aggregation of the winners —
        # the reference's TopK stage is likewise a two-pass block reduce
        # (sampling_topk_kernels.cu topk_stage1/2).  recall 0.95 may drop
        # ~5% of DEEP-tail candidates (ranks far below the nucleus);
        # the 'full' mode stays exact.
        vals, idx = jax.lax.approx_max_k(lg, c, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(lg, c)              # [B, C] desc-sorted
    pre_vals = vals                                   # pre-filter snapshot
    vals = filter_candidates(vals, state.top_k, state.top_p, state.min_p)
    tok_c = jax.vmap(lambda k, l: jax.random.categorical(k, l))(
        sample_keys, vals)                            # [B] candidate index
    tokens = jnp.take_along_axis(idx, tok_c[:, None], axis=1)[:, 0]
    logprobs = jax.nn.log_softmax(vals, axis=-1)
    tok_logprob = jnp.take_along_axis(logprobs, tok_c[:, None], axis=1)[:, 0]
    if topn > 0:
        # alternatives from the PRE-filter distribution (see docstring);
        # candidates are desc-sorted so the top-n are the first n
        # columns.  The reported token logprob switches to the SAME
        # pre-filter distribution so it always equals the chosen
        # token's own entry in top_logprobs (OpenAI semantics; the
        # topn==0 path keeps the post-filter convention).  pre_vals are
        # already temperature-scaled; the report-basis factor restores
        # temp-1.0 values for effectively-greedy slots (temp ~ 0)
        # WITHOUT touching the sampled distribution
        f = (jnp.maximum(state.temperature, 1e-5)
             / report_temperature(state.temperature))[:, None]
        pre_lps = jax.nn.log_softmax(pre_vals * f, axis=-1)
        tok_pre_lp = jnp.take_along_axis(pre_lps, tok_c[:, None],
                                         axis=1)[:, 0]
        return (tokens.astype(jnp.int32), new_keys, tok_pre_lp,
                (idx[:, :topn].astype(jnp.int32), pre_lps[:, :topn]))
    return tokens.astype(jnp.int32), new_keys, tok_logprob


def check_stop(tokens, state: SamplingState, generated):
    """Per-slot finished flags after sampling ``tokens`` (the reference's
    StopCriteria + LengthCriteria layers).

    ``generated`` must already count the new token.
    """
    is_eos = (tokens == state.eos_id) & ~state.ignore_eos
    is_stop = jnp.any(tokens[:, None] == state.stop_words, axis=1)
    too_long = generated >= state.max_new_tokens
    return is_eos | is_stop | too_long


def make_rng_keys(seeds) -> jnp.ndarray:
    """Per-slot key data from integer seeds (host side)."""
    return jax.vmap(lambda s: jax.random.key_data(jax.random.PRNGKey(s)))(
        jnp.asarray(seeds, jnp.uint32))


__all__ = ['SamplingState', 'sample_step', 'check_stop', 'make_rng_keys',
           'apply_repetition_penalty', 'ban_words', 'filter_candidates',
           'top_k_mask', 'top_p_mask', 'min_p_mask',
           'mask_eos_below_min_len']
