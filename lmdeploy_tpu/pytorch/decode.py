"""Batched prompt-logits Engine over HF eager — the perplexity oracle.

Reference: lmdeploy/pytorch/decode.py:155 Engine — splits token batches
across GPUs via multiprocessing and returns per-position logits/ppl.
Here: single-process CPU/TPU-host torch (the TPU engine's decode() path
is the fast equivalent; this exists as the independent cross-check)."""
from __future__ import annotations

from typing import List

import numpy as np


class Engine:
    """Batched decode of prompt logits with padding (right-aligned mask)."""

    def __init__(self, model_path: str, tokenizer_path: str = '',
                 dtype=None):
        import torch
        from transformers import AutoModelForCausalLM
        self.model = AutoModelForCausalLM.from_pretrained(
            model_path, torch_dtype=dtype or torch.float32,
            trust_remote_code=True).eval()

    def decode(self, token_ids: List[List[int]], max_bs: int = 8,
               pad_token_id: int = 0) -> np.ndarray:
        """Returns logits [n, max_len, vocab] (padded positions zeroed)."""
        import torch
        n = len(token_ids)
        max_len = max(len(t) for t in token_ids)
        out = None
        for s in range(0, n, max_bs):
            chunk = token_ids[s:s + max_bs]
            ids = torch.full((len(chunk), max_len), pad_token_id,
                             dtype=torch.long)
            mask = torch.zeros((len(chunk), max_len), dtype=torch.long)
            for i, t in enumerate(chunk):
                ids[i, :len(t)] = torch.as_tensor(t)
                mask[i, :len(t)] = 1
            with torch.no_grad():
                logits = self.model(ids, attention_mask=mask).logits
            logits = logits * mask[..., None]
            arr = logits.float().numpy()
            out = arr if out is None else np.concatenate([out, arr])
        return out


def perplexity(logits: np.ndarray, token_ids: List[List[int]]) -> float:
    """Token-level ppl from decode() output (teacher forcing)."""
    import torch
    nll, count = 0.0, 0
    for i, toks in enumerate(token_ids):
        if len(toks) < 2:
            continue
        lg = torch.from_numpy(logits[i, :len(toks) - 1])
        tgt = torch.as_tensor(toks[1:])
        nll += torch.nn.functional.cross_entropy(
            lg, tgt, reduction='sum').item()
        count += len(toks) - 1
    return float(np.exp(nll / max(count, 1)))


__all__ = ['Engine', 'perplexity']
