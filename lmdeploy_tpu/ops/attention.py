"""GQA attention — pure-XLA reference implementation.

This is the numerics oracle for the Pallas kernels (ops/pallas/*): a
straightforward masked-softmax attention over gathered KV, handling both
prefill (T>1, history offset) and decode (T=1) in one function — the
capability union of the reference's flash_attention2 prefill path and the
decoder_masked_multihead_attention decode kernel.

Everything here is static-shape: queries [B, T, H, Dh] attend to keys
[B, S, KH, Dh] where S is the (padded) maximum context; validity comes
from ``positions`` and causal masking, exactly like the reference builds
causal masks honoring history (invokeCreateCausalMasks,
LlamaContextDecoder.cc:227-234).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def gqa_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                  q_positions: jnp.ndarray, kv_len: jnp.ndarray,
                  scale: float = None, soft_cap: float = 0.0) -> jnp.ndarray:
    """Masked GQA attention.

    Args:
      q: [B, T, H, Dh] queries.
      k, v: [B, S, KH, Dh]; key at index s holds the token at position s.
      q_positions: int32 [B, T] absolute position of each query token;
        padding queries may hold any value (their output is garbage and
        must be masked downstream).
      kv_len: int32 [B] number of valid keys (context length incl. the
        tokens written this step).
      scale: defaults to Dh**-0.5.
    Returns: [B, T, H, Dh] in q.dtype.
    """
    b, t, h, dh = q.shape
    s, kh = k.shape[1], k.shape[2]
    g = h // kh
    if scale is None:
        scale = dh ** -0.5
    qf = q.reshape(b, t, kh, g, dh).astype(jnp.float32) * scale
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    scores = jnp.einsum('btkgd,bskd->btkgs', qf, kf)  # [B,T,KH,G,S]
    if soft_cap > 0.0:
        scores = jnp.tanh(scores / soft_cap) * soft_cap
    kv_pos = jnp.arange(s)[None, None, :]                      # [1,1,S]
    ok = (kv_pos <= q_positions[:, :, None]) & \
         (kv_pos < kv_len[:, None, None])                       # [B,T,S]
    scores = jnp.where(ok[:, :, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('btkgs,bskd->btkgd', probs, vf)
    return out.reshape(b, t, h, dh).astype(q.dtype)


__all__ = ['gqa_attention']
