"""Perplexity / accuracy harness — quantization quality on REAL text.

The reference publishes KV-INT8 and W4A16 accuracy tables
(/root/reference/docs/en/kv_int8.md "Accuracy Test",
/root/reference/docs/en/w4a16.md) produced by external eval stacks; its
in-tree primitive is the prompt-logits decode path
(lmdeploy/turbomind/turbomind.py:364 + tests/pytorch/test_decode.py).
This harness wires that primitive end to end: tokenize a corpus, run the
ENGINE's decode() (chunked-prefill logits) per sample under several
quantization configs, and report token-level perplexity + deltas — the
AWQ-delta north-star check (BASELINE.md).

Usage:
  python -m benchmark.ppl <hf_model_dir> [--dataset wikitext2]
      [--nsamples 8] [--seqlen 512] [--configs bf16,w4a16,kv_int8]
      [--group-size 128] [--oracle]

  dataset: wikitext2 | c4 | ptb | pileval (local HF cache),
           file:<path>, or synthetic (no-network fallback).
  --oracle adds a torch-eager HF cross-check of the bf16 row
  (lmdeploy_tpu.pytorch.decode.Engine — the reference's pytorch PPL
  path, lmdeploy/pytorch/decode.py:155).
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional

import numpy as np


def token_ppl(logits: np.ndarray, ids: List[int]) -> tuple:
    """(sum_nll, count) of teacher-forced next-token prediction.

    logits: [T, V] for positions 0..T-1 predicting ids[1..T]."""
    lg = logits[:len(ids) - 1].astype(np.float64)
    tgt = np.asarray(ids[1:], np.int64)
    mx = lg.max(axis=-1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lg - mx).sum(axis=-1))
    nll = lse - lg[np.arange(len(tgt)), tgt]
    return float(nll.sum()), len(tgt)


def engine_ppl(engine, samples: List[List[int]]) -> float:
    """PPL through TPUEngine's prompt-logits path (chunked prefill)."""
    inst = engine.create_instance()
    nll, count = 0.0, 0
    for ids in samples:
        logits = inst.decode(ids)
        s, c = token_ppl(logits, ids)
        nll += s
        count += c
    return float(np.exp(nll / max(count, 1)))


def load_samples(model_path: str, dataset: str, nsamples: int,
                 seqlen: int) -> List[List[int]]:
    from lmdeploy_tpu.api import _resolve_tokenizer
    from lmdeploy_tpu.lite.utils.calib_dataloader import get_calib_loaders

    class _TokShim:
        """calib_dataloader expects a torch-style tokenizer(text) call."""

        def __init__(self, tok):
            self.tok = tok

        def __call__(self, text, return_tensors='pt'):
            import torch
            ids = self.tok.encode(text)

            class _R:
                input_ids = torch.as_tensor([ids])
            return _R()

    import json as _json
    import os.path as osp
    vocab = 32000
    cfg_path = osp.join(model_path, 'config.json')
    if osp.exists(cfg_path):
        with open(cfg_path) as f:
            d = _json.load(f)
        vocab = d.get('vocab_size') or d.get('model', {}).get(
            'vocab_size', vocab)
    tok = _resolve_tokenizer(model_path, vocab)
    chunks = get_calib_loaders(dataset, _TokShim(tok), nsamples, seqlen)
    return [c[0].tolist() for c in chunks]


def build_variant(model_path: str, variant: str, group_size: int,
                  engine_kw: Dict, calib_dataset: str = 'synthetic'):
    """Build a TPUEngine for one quantization config.

    bf16       — weights as loaded.
    w4a16      — per-group int4 weight quantization, plain min/max.
    w4a16_awq  — AWQ activation-aware smoothing (calibrated on
                 ``calib_dataset``) BEFORE the same min/max int4 pack —
                 the Δppl vs plain w4a16 is the property AWQ sells
                 (reference: lmdeploy/lite/quantization/awq.py).
    kv_int8    — bf16 weights + asymmetric INT8 KV cache
                 (reference quant_policy=4).
    kv_int8_sym — symmetric KV scales (reference kv_qparams --symmetry).
    kv_int4    — bf16 weights + nibble-packed INT4 KV cache
                 (beyond-reference quant_policy=8; 2x KV capacity).
    kv_int4_ph — same with per-head [L, KH] qparams (kv_qparams
                 --per-head; measured worse than per-layer, docs).
    kv_int4_dyn — INT4 KV with DYNAMIC per-token-head scales (the
                 engine default for int4 without calibrated qparams;
                 no calibration pass at all).
    """
    import jax.numpy as jnp

    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.convert.hf import load_hf_dir
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.models.llama import quantize_params

    ecfg = EngineConfig(**engine_kw)
    if variant == 'bf16':
        return build_engine(model_path, engine_config=ecfg)
    cfg, params = load_hf_dir(model_path, jnp.float32)
    if variant == 'w4a16':
        params = quantize_params(params, cfg, group_size=group_size)
        return TPUEngine(cfg, ecfg, params)
    if variant == 'w4a16_awq':
        import tempfile

        import numpy as _np
        import torch
        from transformers import AutoModelForCausalLM

        from lmdeploy_tpu.convert.hf import convert_hf_llama
        from lmdeploy_tpu.lite.apis.calibrate import calibrate
        from lmdeploy_tpu.lite.quantization.awq import smooth_state_dict
        from lmdeploy_tpu.lite.quantization.calibration import load_stats
        with tempfile.TemporaryDirectory() as tmp:
            stats_path = calibrate(model_path, calib_dataset,
                                   calib_samples=8,
                                   calib_seqlen=min(256, ecfg.session_len),
                                   work_dir=tmp)
            inputs, _, _ = load_stats(stats_path)
        act_absmax = {n: st['absmax'] for n, st in inputs.items()}
        hf_model = AutoModelForCausalLM.from_pretrained(
            model_path, torch_dtype=torch.float32, trust_remote_code=True)
        sd = {k: v.detach().float().numpy()
              for k, v in hf_model.state_dict().items()}
        prefix = 'transformer.h' if 'qwen' in cfg.model_name.lower() \
            else 'model.layers'
        smooth_state_dict(sd, cfg.model_name, act_absmax, cfg.num_layer,
                          group_size=group_size, layer_prefix=prefix)
        params = convert_hf_llama(sd, cfg, _np.float32)
        params = quantize_params(params, cfg, group_size=group_size)
        return TPUEngine(cfg, ecfg, params)
    if variant == 'kv_int4_dyn':
        import dataclasses
        ecfg = dataclasses.replace(ecfg, quant_policy=8, kv_dtype='int4')
        return TPUEngine(cfg, ecfg, params)
    if variant in ('kv_int8', 'kv_int8_sym', 'kv_int4', 'kv_int4_ph'):
        import tempfile

        from lmdeploy_tpu.lite.apis.calibrate import calibrate
        from lmdeploy_tpu.lite.apis.kv_qparams import kv_qparams
        bits = 4 if variant.startswith('kv_int4') else 8
        with tempfile.TemporaryDirectory() as tmp:
            calibrate(model_path, calib_dataset, calib_samples=4,
                      calib_seqlen=min(256, ecfg.session_len),
                      work_dir=tmp)
            cfg_path = f'{tmp}/config.json'
            with open(cfg_path, 'w') as f:
                json.dump({}, f)
            kv_qparams(tmp, tmp, kv_bits=bits,
                       kv_sym=variant.endswith('_sym'),
                       per_head=variant.endswith('_ph'))
            with open(cfg_path) as f:
                kv_scales = json.load(f)['kv_scales']
        import dataclasses
        ecfg = dataclasses.replace(
            ecfg, quant_policy=8 if bits == 4 else 4,
            kv_dtype='int4' if bits == 4 else 'int8')
        return TPUEngine(cfg, ecfg, params, kv_scales=kv_scales)
    raise ValueError(f'unknown variant {variant!r}')


def run(model_path: str, dataset: str = 'synthetic', nsamples: int = 8,
        seqlen: int = 512, configs: Optional[List[str]] = None,
        group_size: int = 128, oracle: bool = False,
        engine_kw: Optional[Dict] = None) -> Dict[str, float]:
    configs = configs or ['bf16', 'w4a16', 'kv_int8']
    engine_kw = dict(engine_kw or {})
    engine_kw.setdefault('session_len', seqlen + 8)
    engine_kw.setdefault('max_context_token_num', 512)
    samples = load_samples(model_path, dataset, nsamples, seqlen)
    print(f'# {len(samples)} samples x {seqlen} tokens from {dataset}')

    results: Dict[str, float] = {}
    for variant in configs:
        eng = build_variant(model_path, variant, group_size, engine_kw,
                            calib_dataset=dataset)
        try:
            results[variant] = engine_ppl(eng, samples)
        finally:
            eng.shutdown()
        base = results.get(configs[0])
        delta = results[variant] - base if base else 0.0
        print(f'{variant:8s} ppl = {results[variant]:10.4f}   '
              f'delta = {delta:+.4f}')

    if oracle:
        from lmdeploy_tpu.pytorch.decode import Engine as TorchEngine
        te = TorchEngine(model_path)
        logits = te.decode(samples)
        nll, count = 0.0, 0
        for i, ids in enumerate(samples):
            s, c = token_ppl(logits[i], ids)
            nll += s
            count += c
        results['torch_oracle'] = float(np.exp(nll / max(count, 1)))
        print(f'{"oracle":8s} ppl = {results["torch_oracle"]:10.4f}   '
              f'(torch eager fp32 cross-check)')
    return results


def main():
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu ppl harness')
    ap.add_argument('model_path', help='HF model dir')
    ap.add_argument('--dataset', default='wikitext2')
    ap.add_argument('--nsamples', type=int, default=8)
    ap.add_argument('--seqlen', type=int, default=512)
    ap.add_argument('--configs', default='bf16,w4a16,kv_int8')
    ap.add_argument('--group-size', type=int, default=128)
    ap.add_argument('--oracle', action='store_true')
    args = ap.parse_args()
    out = run(args.model_path, args.dataset, args.nsamples, args.seqlen,
              args.configs.split(','), args.group_size, args.oracle)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
