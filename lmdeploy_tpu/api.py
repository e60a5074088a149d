"""Top-level facade: build an engine from a model path.

Reference: lmdeploy/turbomind/turbomind.py TurboMind(model_path, ...) —
loads workspace config, resolves the chat template and stop words, and
spins up the engine.
"""
from __future__ import annotations

import os.path as osp
from typing import Optional

from .config import EngineConfig, ModelConfig
from .engine.engine import TPUEngine
from .model import MODELS, best_match_model
from .tokenizer import DummyTokenizer, Tokenizer


def _resolve_tokenizer(model_path: str, vocab_size: int):
    for probe in ('tokenizer.json', 'tokenizer.model', 'tokenizer_config.json'):
        if osp.exists(osp.join(model_path, probe)):
            try:
                return Tokenizer(model_path)
            except Exception:
                break
    return DummyTokenizer(vocab_size=vocab_size)


def build_engine(model_path: str,
                 engine_config: Optional[EngineConfig] = None,
                 model_name: str = '', tp: int = 1, pp: int = 1,
                 dp: int = 1, quant_policy: Optional[int] = None,
                 speculative_k: Optional[int] = None,
                 **engine_kw) -> TPUEngine:
    """Load a workspace (converted) or HF directory and start the engine.

    ``quant_policy`` overrides the KV-cache policy of whatever engine
    config is resolved (0 bf16, 4 int8, 8 int4 — reference CLI parity;
    int4 without calibrated qparams uses dynamic per-token scales).
    ``speculative_k`` overrides the speculative draft length the same
    way (0 disables; beyond-reference prompt-lookup decoding)."""
    import dataclasses

    from .convert.converter import is_workspace, load_workspace

    kv_scales = None
    if is_workspace(model_path):
        cfg, ws_ecfg, params, kv_scales = load_workspace(model_path)
        engine_config = engine_config or ws_ecfg
        # measured packed-kernel tile winners (autotune.py --packed)
        import json as _json
        import os.path as _osp
        tune = _osp.join(model_path, 'mm_tune.json')
        if _osp.exists(tune):
            from .ops.linear import set_tune_table
            with open(tune) as f:
                set_tune_table(_json.load(f))
    else:
        import jax.numpy as jnp
        from .convert.hf import load_hf_dir
        # runtime weights in bf16 — f32 would double HBM and halve the
        # decode bandwidth the engine is built around
        cfg, params = load_hf_dir(model_path, jnp.bfloat16)

    if engine_config is None:
        engine_config = EngineConfig(session_len=cfg.session_len, tp=tp,
                                     pp=pp, dp=dp)
    else:
        if tp > 1:
            engine_config.tp = max(engine_config.tp, tp)
        if pp > 1:
            engine_config.pp = max(engine_config.pp, pp)
        if dp > 1:
            engine_config.dp = max(engine_config.dp, dp)
    if quant_policy is not None:
        # replace re-runs __post_init__, which derives kv_dtype
        engine_config = dataclasses.replace(engine_config,
                                            quant_policy=quant_policy)
    if speculative_k is not None:
        engine_config = dataclasses.replace(engine_config,
                                            speculative_k=speculative_k)

    name = model_name or cfg.model_name
    template_name = name if name in MODELS.module_dict else \
        (best_match_model(name) or best_match_model(model_path) or 'base')
    template = MODELS.get(template_name)()
    stop_words = template.stop_words or []

    tokenizer = _resolve_tokenizer(model_path, cfg.vocab_size)
    engine = TPUEngine(cfg, engine_config, params, tokenizer=tokenizer,
                       stop_words=stop_words, kv_scales=kv_scales, **engine_kw)
    engine.chat_template = template
    engine.template_name = template_name
    return engine


__all__ = ['build_engine']
