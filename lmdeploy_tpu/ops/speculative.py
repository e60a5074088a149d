"""Speculative decoding building blocks — prompt-lookup (n-gram) drafts.

Beyond-reference capability (the reference has no speculative decoding).
TPU-native design: the draft proposal runs IN-JIT over the device-resident
history (no host round trip), and verification reuses the unified
prefill/decode forward over [B, K+1] positions.  bs1 decode is
HBM-bandwidth-bound, so verifying K+1 positions streams the same weight
bytes as generating ONE token — rejected drafts are nearly free and
accepted drafts multiply tokens/step (prompt-lookup pays off on
repetitive text: code, quotes, multi-turn chat).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _hist_gather(history, idx):
    """``take_along_axis`` over [B, S] token histories.  With
    LMDEPLOY_TPU_NGRAM_DOT=1 it lowers as a one-hot f32 einsum (MXU dot)
    instead of a gather — dynamic gathers over [B, S] are the
    serial-loop class on this TPU runtime, and these run once per
    speculative round inside the scan (A/B cell
    .r5/spec_overhead:greedy_k4_dot).  Token ids < 2^24 are exact in
    f32."""
    import os
    if os.environ.get('LMDEPLOY_TPU_NGRAM_DOT', '0') != '1':
        return jnp.take_along_axis(history, idx, axis=1)
    s = history.shape[1]
    oh = jax.nn.one_hot(idx, s, dtype=jnp.float32)        # [B, n, S]
    out = jnp.einsum('bns,bs->bn', oh, history.astype(jnp.float32))
    return out.astype(history.dtype)


def _ngram_match_pos(history, history_len, ngram: int):
    """Most recent position whose preceding ``ngram`` tokens equal the
    current suffix; -1 where none.  Returns int32 [B]."""
    b, s = history.shape
    pos = jnp.arange(s)

    # suffix[b, t] = history[b, hl - ngram + t]
    suf_idx = history_len[:, None] - ngram + jnp.arange(ngram)[None]
    suffix = _hist_gather(history, jnp.maximum(suf_idx, 0))

    # match[b, j] = history[b, j-ngram : j] == suffix  (candidate start j).
    # Each comparison row is a STATIC right-shift of the history — a
    # zero-pad + slice (pure layout, fuses away), NOT a take_along_axis
    # gather (dynamic gathers over [B, S] lower to one-hot matmuls /
    # serial loops on TPU and ran once per spec round in the scan)
    match = jnp.ones((b, s), bool)
    for t in range(ngram):
        shifted = jnp.pad(history, ((0, 0), (ngram - t, 0)))[:, :s]
        match &= shifted == suffix[:, t:t + 1]
    # j must start strictly before the current continuation point and
    # leave the suffix itself out (otherwise it trivially matches
    # itself); pos >= ngram also kills the zero-padded columns
    match &= (pos[None] < history_len[:, None] - 1) \
        & (pos[None] >= ngram)
    # a suffix shorter than ngram (fresh session) must not match
    long_enough = history_len >= ngram + 1

    # most recent match: max masked index
    j = jnp.max(jnp.where(match, pos[None], -1), axis=1)        # [B]
    return jnp.where(long_enough, j, -1)


def ngram_propose(history: jnp.ndarray, history_len: jnp.ndarray,
                  k: int, ngram: int = 3, ngram_min: int = 0) -> jnp.ndarray:
    """Propose ``k`` draft tokens per slot by prompt lookup.

    Finds the most recent earlier position whose preceding suffix equals
    the current suffix and proposes the tokens that followed it
    (vLLM-style prompt-lookup decoding, device-side).  With
    ``ngram_min`` < ``ngram`` the lookup CASCADES longest-match-first:
    an ``ngram``-token suffix match is preferred (more context, higher
    acceptance), falling back to shorter suffixes down to ``ngram_min``
    so slots without a long match still get a draft.  The extra match
    passes are trivial elementwise work over the device-resident
    history — acceptance is what the verify round's HBM bytes buy.

    Args:
      history: int32 [B, S] token history; history[:, :history_len] valid,
        ending with the current last token.
      history_len: int32 [B].
      k: draft length.
      ngram: longest suffix length to try.
      ngram_min: shortest suffix length to fall back to (0/None -> no
        cascade, exactly ``ngram`` like the classic formulation).
    Returns int32 [B, k] drafts (zeros when no match — they simply get
    rejected by verification, which costs nothing extra).
    """
    b, s = history.shape
    lo = ngram_min if ngram_min and ngram_min < ngram else ngram
    j = jnp.full((b,), -1, jnp.int32)
    for n in range(ngram, lo - 1, -1):     # longest match wins
        jn = _ngram_match_pos(history, history_len, n)
        j = jnp.where(j >= 0, j, jn)
    has = j >= 0
    j = jnp.maximum(j, 0)

    draft_idx = j[:, None] + jnp.arange(k)[None]                # [B, k]
    draft_idx = jnp.minimum(draft_idx, s - 1)
    draft = _hist_gather(history, draft_idx)
    # tokens at/after history_len are stale — zero them (rejected wlog)
    ok = has[:, None] & (j[:, None] + jnp.arange(k)[None]
                         < history_len[:, None])
    return jnp.where(ok, draft, 0).astype(jnp.int32)


def spec_verify_sample(logits: jnp.ndarray, draft: jnp.ndarray, smp,
                       history: jnp.ndarray, history_len: jnp.ndarray,
                       generated: jnp.ndarray, sample_keys,
                       mode: str = 'candidates', topn: int = 0):
    """Exact rejection-sampling verification of deterministic drafts.

    Prompt-lookup drafts are point masses (q = delta at the drafted
    token), so the speculative-sampling accept rule (Leviathan/Chen:
    accept x ~ q with prob min(1, p(x)/q(x)), resample the residual
    max(0, p-q) on rejection) collapses to: accept draft d_i with
    probability p_i(d_i); on rejection sample from p_i with d_i masked
    out, renormalized.  The emitted marginal at every position is
    EXACTLY p_i — the same post-processed distribution the plain path's
    sample_step draws from, including ban-words, min-length EOS masking,
    repetition/presence penalties (seen-set extended with the draft
    prefix: position i is only reachable when drafts 0..i-1 were
    accepted, so its true context IS history + draft[:i]), temperature,
    and the top-k/top-p/min-p filters.

    For a top_k==1 slot the filtered distribution is a point mass on the
    processed argmax, so accept/resample degenerate to the greedy
    match-or-correct rule — one compiled program serves mixed
    greedy/sampled batches with per-slot exactness.

    Args:
      logits: [B, K+1, V] raw verify logits (vocab padding masked).
      draft: int32 [B, K] proposed tokens.
      smp: SamplingState ([B] parameters).
      history / history_len: as DecodeState (history[:hl] ends with the
        current input token).
      generated: int32 [B] tokens generated before this round.
      sample_keys: [B] jax PRNG keys consumed by this round's draws.
      mode: 'candidates' (top-1024 pipeline) or 'full' (exact full-vocab
        sort for top_k<=0 slots) — mirrors sample_step's static modes.
      topn: STATIC; when > 0 additionally return the top-``topn``
        alternative tokens + logprobs PER VERIFY POSITION from the
        pre-filter distribution, exactly like sample_step's ``topn``
        (OpenAI top_logprobs for generated tokens WITHOUT forfeiting
        speculation).  The reported token logprob then switches to the
        same pre-filter distribution so it always equals the chosen
        token's own top_logprobs entry (sample_step's convention).
    Returns:
      (g int32 [B, K+1], accept bool [B, K], logp f32 [B, K+1]) — plus
      (top_ids int32 [B, K+1, topn], top_lps f32 [B, K+1, topn]) when
      ``topn`` > 0.
      g[:, i] = draft token where accepted else the rejection resample;
      g[:, K] = the bonus sample; logp[:, i] = log p_i(g_i) under the
      processed distribution (the plain path's logprob semantics — a
      top_k==1 slot gets exactly 0) or, with ``topn`` > 0, under the
      pre-filter distribution.
    """
    from .sampling import (MAX_TOPK, NEG_INF, _approx_topk,
                           apply_repetition_penalty, ban_words,
                           filter_candidates, mask_eos_below_min_len,
                           report_temperature)
    b, kp1, v = logits.shape
    k = kp1 - 1

    def rep(a):  # per-slot param -> per-(slot, position) rows
        return jnp.repeat(a, kp1, axis=0)

    lgf = logits.astype(jnp.float32).reshape(b * kp1, v)
    lgf = jax.lax.cond(
        jnp.any(smp.bad_words >= 0),
        lambda lg: ban_words(lg, rep(smp.bad_words)), lambda lg: lg, lgf)
    t_idx = jnp.arange(kp1, dtype=jnp.int32)[None]
    gen_i = (generated[:, None] + t_idx).reshape(-1)
    lgf = mask_eos_below_min_len(lgf, rep(smp.eos_id), gen_i,
                                 rep(smp.min_new_tokens))
    # scatter the drafts at history_len.. so position i's validity
    # window (iota < history_len + i) covers exactly draft[:i]
    d_pos = history_len[:, None] + jnp.arange(k, dtype=jnp.int32)[None]
    hist_ext = history.at[
        jnp.arange(b)[:, None], d_pos].set(draft, mode='drop')
    hl_i = (history_len[:, None] + t_idx).reshape(-1)
    lgf = jax.lax.cond(
        jnp.any(smp.repetition_penalty != 1.0)
        | jnp.any(smp.presence_penalty != 0.0)
        | jnp.any(smp.frequency_penalty != 0.0),
        lambda lg: apply_repetition_penalty(
            lg, rep(hist_ext), hl_i, rep(smp.repetition_penalty),
            rep(smp.presence_penalty), rep(smp.frequency_penalty),
            # presence/frequency count GENERATED tokens only, exactly
            # like the plain path (sample_step) — the verify marginal
            # must equal the plain-path distribution; gen_start is
            # position-invariant: draft positions extend history and
            # generated count in lockstep
            gen_start=rep(history_len - generated)),
        lambda lg: lg, lgf)
    lgf = lgf / jnp.maximum(rep(smp.temperature), 1e-5)[:, None]

    c = v if (mode == 'full' or v <= MAX_TOPK) else MAX_TOPK
    if c < v and _approx_topk():
        vals, idx = jax.lax.approx_max_k(lgf, c, recall_target=0.95)
    else:
        vals, idx = jax.lax.top_k(lgf, c)
    pre_vals = vals                         # pre-filter snapshot (topn)
    # the exact filter cascade of sample_step's candidate pipeline
    vals = filter_candidates(vals, rep(smp.top_k), rep(smp.top_p),
                             rep(smp.min_p))

    vals3 = vals.reshape(b, kp1, c)
    idx3 = idx.reshape(b, kp1, c)
    probs_f = jax.nn.softmax(vals3, axis=-1)            # final p_i
    is_draft = idx3[:, :k] == draft[:, :, None]         # [B, K, C]
    p_draft = jnp.sum(jnp.where(is_draft, probs_f[:, :k], 0.0), axis=-1)

    ks = jax.vmap(jax.random.split)(sample_keys)        # [B, 2] keys
    u = jax.vmap(lambda key: jax.random.uniform(key, (k,)))(ks[:, 0])
    accept = u < p_draft                                # [B, K]

    # residual rows: draft candidate masked for i<K; bonus row unmasked.
    # If masking empties a row (top_k==1 and draft == argmax) the
    # rejection branch has probability <= float-eps — fall back to the
    # unmasked row so the categorical never sees an all -inf input.
    mask_d = jnp.concatenate(
        [is_draft, jnp.zeros((b, 1, c), bool)], axis=1)
    vals_rs = jnp.where(mask_d, NEG_INF, vals3)
    empty = jnp.all(vals_rs <= NEG_INF, axis=-1, keepdims=True)
    vals_rs = jnp.where(empty, vals3, vals_rs)
    tok_c = jax.vmap(jax.random.categorical)(ks[:, 1], vals_rs)  # [B,K+1]
    samp = jnp.take_along_axis(idx3, tok_c[..., None], axis=-1)[..., 0]
    g = jnp.concatenate(
        [jnp.where(accept, draft, samp[:, :k]), samp[:, k:]], axis=1)
    g = g.astype(jnp.int32)
    # emitted-token logprob under the PROCESSED distribution (plain-path
    # semantics: the token's probability after all filters, NOT the
    # residual it may have been resampled from)
    p_g = jnp.sum(jnp.where(idx3 == g[..., None], probs_f, 0.0), axis=-1)
    logp = jnp.log(jnp.maximum(p_g, 1e-30))
    if topn > 0:
        # candidates are desc-sorted, so the top-n pre-filter
        # alternatives are the first n columns (sample_step's layout).
        # pre_vals are temperature-scaled; restore the temp-1.0 report
        # basis for effectively-greedy slots (report_temperature)
        f = (jnp.maximum(rep(smp.temperature), 1e-5)
             / report_temperature(rep(smp.temperature)))[:, None]
        pre_lps = jax.nn.log_softmax(pre_vals * f, axis=-1)
        top_ids = idx[:, :topn].reshape(b, kp1, topn).astype(jnp.int32)
        top_lps = pre_lps[:, :topn].reshape(b, kp1, topn)
        pre_lps3 = pre_lps.reshape(b, kp1, c)
        # every emittable g is in the candidate set (acceptance needs
        # p_draft > 0; resamples index idx3), so the masked sum is exact
        logp = jnp.sum(jnp.where(idx3 == g[..., None], pre_lps3, 0.0),
                       axis=-1)
        return g, accept, logp, (top_ids, top_lps)
    return g, accept, logp


def greedy_argmax(logits: jnp.ndarray) -> jnp.ndarray:
    """Argmax over the last dim via max + first-match iota.

    jnp.argmax's variadic reduce compiles catastrophically on the target
    TPU runtime (see ops/sampling.py greedy notes); two plain reduces
    lower cleanly.
    """
    v = logits.shape[-1]
    m = jnp.max(logits, axis=-1, keepdims=True)
    iota = jax.lax.broadcasted_iota(jnp.int32, logits.shape,
                                    logits.ndim - 1)
    return jnp.min(jnp.where(logits >= m, iota, v), axis=-1) \
        .astype(jnp.int32)


__all__ = ['ngram_propose', 'greedy_argmax', 'spec_verify_sample']
