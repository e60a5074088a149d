"""Original meta-llama checkpoint (``consolidated.*.pth``) ingestion.

Parity with the reference's ``deploy_llama``
(lmdeploy/serve/turbomind/deploy.py:263): reads ``params.json`` + the
model-parallel ``consolidated.NN.pth`` shards, merges them along each
tensor family's split dim, and re-permutes q/k rows from Meta's
interleaved rope-pair layout to the HF rotate-half convention this
framework computes rope in (deploy.py:371's inverse intent — the
reference permutes HF->Meta for its CUDA kernels; we permute Meta->HF).

The merged tensors are renamed into an HF-style state_dict and funneled
through :func:`convert_hf_llama`, so both ingestion paths share one
tested mapping.
"""
from __future__ import annotations

import glob
import json
import os.path as osp
from typing import Any, Dict

import numpy as np

from ..config import ModelConfig

# concat dim of each Meta tensor family across consolidated.* shards
# (column-parallel weights shard their OUT dim = torch dim 0; row-parallel
# shard the IN dim = torch dim 1; embeddings shard the feature dim)
_SHARD_DIM = {
    'attention.wq.weight': 0,
    'attention.wk.weight': 0,
    'attention.wv.weight': 0,
    'attention.wo.weight': 1,
    'feed_forward.w1.weight': 0,
    'feed_forward.w2.weight': 1,
    'feed_forward.w3.weight': 0,
    'tok_embeddings.weight': 1,
    'output.weight': 0,
}
_REPLICATED = ('attention_norm.weight', 'ffn_norm.weight', 'norm.weight')


def is_meta_llama(path: str) -> bool:
    return (osp.exists(osp.join(path, 'params.json'))
            and bool(glob.glob(osp.join(path, 'consolidated.*.pth'))))


def _unpermute_rope(w: np.ndarray, n_heads: int) -> np.ndarray:
    """Meta interleaved rope pairs -> HF half-split convention.

    Meta stores each head's rows as (re0, im0, re1, im1, ...); HF's
    rotate-half expects (re0, re1, ..., im0, im1, ...).  This is the
    inverse of the `permute` in HF's convert_llama_weights_to_hf.py.
    ``w``: [n_heads*dh, in].
    """
    out, inner = w.shape
    dh = out // n_heads
    return (w.reshape(n_heads, dh // 2, 2, inner)
             .transpose(0, 2, 1, 3)
             .reshape(out, inner))


def _merge_shards(shards, key: str) -> np.ndarray:
    parts = [np.asarray(sd[key].float().numpy() if hasattr(sd[key], 'float')
                        else sd[key], np.float32) for sd in shards]
    base = key.split('.', 2)[-1] if key.startswith('layers.') else key
    if base in _REPLICATED or key in _REPLICATED:
        return parts[0]
    dim = _SHARD_DIM.get(base if base in _SHARD_DIM else key)
    if dim is None:
        raise KeyError(f'unknown meta checkpoint tensor {key}')
    return parts[0] if len(parts) == 1 else np.concatenate(parts, axis=dim)


def load_meta_dir(model_dir: str, dtype=np.float32):
    """Load a meta-llama original checkpoint directory.

    Returns ``(ModelConfig, params)`` with the same pytree contract as
    :func:`convert.hf.load_hf_dir`.
    """
    import torch

    from .hf import convert_hf_llama

    with open(osp.join(model_dir, 'params.json')) as f:
        meta = json.load(f)
    files = sorted(glob.glob(osp.join(model_dir, 'consolidated.*.pth')))
    shards = [torch.load(f, map_location='cpu', weights_only=True)
              for f in files]

    n_heads = meta['n_heads']
    n_kv = meta.get('n_kv_heads', n_heads)
    nl = meta['n_layers']
    dim = meta['dim']
    dh = dim // n_heads

    sd: Dict[str, Any] = {}
    for i in range(nl):
        p = f'layers.{i}'
        q = _merge_shards(shards, f'{p}.attention.wq.weight')
        k = _merge_shards(shards, f'{p}.attention.wk.weight')
        hp = f'model.layers.{i}'
        sd[f'{hp}.self_attn.q_proj.weight'] = _unpermute_rope(q, n_heads)
        sd[f'{hp}.self_attn.k_proj.weight'] = _unpermute_rope(k, n_kv)
        sd[f'{hp}.self_attn.v_proj.weight'] = _merge_shards(
            shards, f'{p}.attention.wv.weight')
        sd[f'{hp}.self_attn.o_proj.weight'] = _merge_shards(
            shards, f'{p}.attention.wo.weight')
        sd[f'{hp}.mlp.gate_proj.weight'] = _merge_shards(
            shards, f'{p}.feed_forward.w1.weight')
        sd[f'{hp}.mlp.down_proj.weight'] = _merge_shards(
            shards, f'{p}.feed_forward.w2.weight')
        sd[f'{hp}.mlp.up_proj.weight'] = _merge_shards(
            shards, f'{p}.feed_forward.w3.weight')
        sd[f'{hp}.input_layernorm.weight'] = _merge_shards(
            shards, f'{p}.attention_norm.weight')
        sd[f'{hp}.post_attention_layernorm.weight'] = _merge_shards(
            shards, f'{p}.ffn_norm.weight')
    sd['model.embed_tokens.weight'] = _merge_shards(
        shards, 'tok_embeddings.weight')
    sd['model.norm.weight'] = _merge_shards(shards, 'norm.weight')
    sd['lm_head.weight'] = _merge_shards(shards, 'output.weight')

    vocab = sd['model.embed_tokens.weight'].shape[0]  # params.json may say -1
    inter = sd['model.layers.0.mlp.gate_proj.weight'].shape[0]
    cfg = ModelConfig(
        model_name=osp.basename(model_dir.rstrip('/')) or 'llama',
        head_num=n_heads, kv_head_num=n_kv, size_per_head=dh,
        inter_size=inter, num_layer=nl, vocab_size=vocab,
        norm_eps=meta.get('norm_eps', 1e-6), rotary_embedding=dh,
        rope_theta=meta.get('rope_theta', 10000.0),
        max_position_embeddings=meta.get('max_seq_len', 2048))
    return cfg, convert_hf_llama(sd, cfg, dtype)


__all__ = ['is_meta_llama', 'load_meta_dir']
