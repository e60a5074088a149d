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


def ngram_propose(history: jnp.ndarray, history_len: jnp.ndarray,
                  k: int, ngram: int = 3) -> jnp.ndarray:
    """Propose ``k`` draft tokens per slot by prompt lookup.

    Finds the most recent earlier position whose preceding ``ngram``
    tokens equal the current suffix and proposes the tokens that followed
    it (vLLM-style prompt-lookup decoding, device-side).

    Args:
      history: int32 [B, S] token history; history[:, :history_len] valid,
        ending with the current last token.
      history_len: int32 [B].
      k: draft length.
      ngram: suffix length to match.
    Returns int32 [B, k] drafts (zeros when no match — they simply get
    rejected by verification, which costs nothing extra).
    """
    b, s = history.shape
    pos = jnp.arange(s)

    # suffix[b, t] = history[b, hl - ngram + t]
    suf_idx = history_len[:, None] - ngram + jnp.arange(ngram)[None]
    suffix = jnp.take_along_axis(history, jnp.maximum(suf_idx, 0), axis=1)

    # match[b, j] = history[b, j-ngram : j] == suffix  (candidate start j)
    match = jnp.ones((b, s), bool)
    for t in range(ngram):
        shifted_idx = pos[None] - ngram + t
        shifted = jnp.take_along_axis(
            history, jnp.maximum(shifted_idx, 0), axis=1)
        match &= (shifted == suffix[:, t:t + 1]) & (shifted_idx >= 0)
    # j must start strictly before the current continuation point and
    # leave the suffix itself out (otherwise it trivially matches itself)
    match &= (pos[None] < history_len[:, None] - 1) \
        & (pos[None] >= ngram)

    # most recent match: max masked index
    j = jnp.max(jnp.where(match, pos[None], -1), axis=1)        # [B]
    has = j >= 0

    draft_idx = j[:, None] + jnp.arange(k)[None]                # [B, k]
    draft_idx = jnp.minimum(draft_idx, s - 1)
    draft = jnp.take_along_axis(history, draft_idx, axis=1)
    # tokens at/after history_len are stale — zero them (rejected wlog)
    ok = has[:, None] & (j[:, None] + jnp.arange(k)[None]
                         < history_len[:, None])
    return jnp.where(ok, draft, 0).astype(jnp.int32)


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


__all__ = ['ngram_propose', 'greedy_argmax']
