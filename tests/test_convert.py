"""Converter tests across model families using synthetic HF state dicts
(reference: deploy.py handles llama/hf, qwen, baichuan layouts)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import ModelConfig
from lmdeploy_tpu.convert.hf import config_from_hf, convert_hf_llama


def test_config_from_hf_llama():
    cfg = config_from_hf({
        'architectures': ['LlamaForCausalLM'], 'num_attention_heads': 32,
        'hidden_size': 4096, 'num_key_value_heads': 32,
        'intermediate_size': 11008, 'num_hidden_layers': 32,
        'vocab_size': 32000, 'rms_norm_eps': 1e-5, 'rope_theta': 10000.0,
        'max_position_embeddings': 4096}, 'llama2')
    assert cfg.head_num == 32 and cfg.inter_size == 11008
    assert cfg.norm_eps == 1e-5 and cfg.session_len >= 4096


def _llama_sd(nl=2, d=32, h=4, kh=2, inter=64, v=64, bias=False):
    rng = np.random.default_rng(0)
    dh = d // h
    sd = {
        'model.embed_tokens.weight': rng.normal(size=(v, d)).astype(np.float32),
        'model.norm.weight': np.ones((d,), np.float32),
        'lm_head.weight': rng.normal(size=(v, d)).astype(np.float32),
    }
    for i in range(nl):
        p = f'model.layers.{i}'
        sd[f'{p}.self_attn.q_proj.weight'] = rng.normal(size=(h * dh, d)).astype(np.float32)
        sd[f'{p}.self_attn.k_proj.weight'] = rng.normal(size=(kh * dh, d)).astype(np.float32)
        sd[f'{p}.self_attn.v_proj.weight'] = rng.normal(size=(kh * dh, d)).astype(np.float32)
        sd[f'{p}.self_attn.o_proj.weight'] = rng.normal(size=(d, h * dh)).astype(np.float32)
        sd[f'{p}.mlp.gate_proj.weight'] = rng.normal(size=(inter, d)).astype(np.float32)
        sd[f'{p}.mlp.up_proj.weight'] = rng.normal(size=(inter, d)).astype(np.float32)
        sd[f'{p}.mlp.down_proj.weight'] = rng.normal(size=(d, inter)).astype(np.float32)
        sd[f'{p}.input_layernorm.weight'] = np.ones((d,), np.float32)
        sd[f'{p}.post_attention_layernorm.weight'] = np.ones((d,), np.float32)
        if bias:
            for n, dim in (('q_proj', h * dh), ('k_proj', kh * dh),
                           ('v_proj', kh * dh), ('o_proj', d)):
                sd[f'{p}.self_attn.{n}.bias'] = rng.normal(size=(dim,)).astype(np.float32)
    return sd


def test_convert_llama_shapes():
    cfg = ModelConfig(model_name='llama', head_num=4, kv_head_num=2,
                      size_per_head=8, inter_size=64, num_layer=2,
                      vocab_size=64, rotary_embedding=8)
    params = convert_hf_llama(_llama_sd(), cfg, np.float32)
    assert params['layers']['wqkv'].shape == (2, 32, (4 + 4) * 8)
    assert params['layers']['wo'].shape == (2, 32, 32)
    assert params['lm_head'].shape[0] == 32
    # qkv fused column-wise: q block must equal q_proj.T
    sd = _llama_sd()
    q = sd['model.layers.0.self_attn.q_proj.weight'].T
    np.testing.assert_allclose(np.asarray(params['layers']['wqkv'][0, :, :32]),
                               q, rtol=1e-6)


def test_convert_internlm_bias():
    cfg = ModelConfig(model_name='internlm', head_num=4, kv_head_num=2,
                      size_per_head=8, inter_size=64, num_layer=2,
                      vocab_size=64, rotary_embedding=8, attn_bias=True)
    params = convert_hf_llama(_llama_sd(bias=True), cfg, np.float32)
    assert 'bqkv' in params['layers'] and 'bo' in params['layers']
    assert params['layers']['bqkv'].shape == (2, 64)


def test_convert_baichuan_wpack():
    rng = np.random.default_rng(1)
    d, v, inter, nl = 32, 64, 64, 1
    sd = {
        'model.embed_tokens.weight': rng.normal(size=(v, d)).astype(np.float32),
        'model.norm.weight': np.ones((d,), np.float32),
        'lm_head.weight': rng.normal(size=(v, d)).astype(np.float32),
        'model.layers.0.self_attn.W_pack.weight':
            rng.normal(size=(3 * d, d)).astype(np.float32),
        'model.layers.0.self_attn.o_proj.weight':
            rng.normal(size=(d, d)).astype(np.float32),
        'model.layers.0.mlp.gate_proj.weight':
            rng.normal(size=(inter, d)).astype(np.float32),
        'model.layers.0.mlp.up_proj.weight':
            rng.normal(size=(inter, d)).astype(np.float32),
        'model.layers.0.mlp.down_proj.weight':
            rng.normal(size=(d, inter)).astype(np.float32),
        'model.layers.0.input_layernorm.weight': np.ones((d,), np.float32),
        'model.layers.0.post_attention_layernorm.weight':
            np.ones((d,), np.float32),
    }
    cfg = ModelConfig(model_name='baichuan', head_num=4, kv_head_num=4,
                      size_per_head=8, inter_size=inter, num_layer=nl,
                      vocab_size=v, rotary_embedding=8)
    params = convert_hf_llama(sd, cfg, np.float32)
    np.testing.assert_allclose(
        np.asarray(params['layers']['wqkv'][0]),
        sd['model.layers.0.self_attn.W_pack.weight'].T, rtol=1e-6)


def test_convert_baichuan2_lm_head_normalized():
    sd = _llama_sd(nl=1)
    # baichuan uses fused W_pack instead of q/k/v
    d = 32
    sd['model.layers.0.self_attn.W_pack.weight'] = np.concatenate(
        [sd.pop('model.layers.0.self_attn.q_proj.weight'),
         sd.pop('model.layers.0.self_attn.k_proj.weight'),
         sd.pop('model.layers.0.self_attn.v_proj.weight')], axis=0)
    sd = {k: v for k, v in sd.items() if '.layers.1.' not in k}
    cfg = ModelConfig(model_name='baichuan2', head_num=4, kv_head_num=2,
                      size_per_head=8, inter_size=64, num_layer=1,
                      vocab_size=64, rotary_embedding=8)
    params = convert_hf_llama(sd, cfg, np.float32)
    head = np.asarray(params['lm_head'])[:, :64]
    norms = np.linalg.norm(head, axis=0)
    np.testing.assert_allclose(norms, np.ones_like(norms), rtol=1e-5)


def test_convert_qwen_layout():
    rng = np.random.default_rng(2)
    d, v, inter, nl = 32, 64, 32, 1
    sd = {
        'transformer.wte.weight': rng.normal(size=(v, d)).astype(np.float32),
        'transformer.ln_f.weight': np.ones((d,), np.float32),
        'lm_head.weight': rng.normal(size=(v, d)).astype(np.float32),
        'transformer.h.0.attn.c_attn.weight':
            rng.normal(size=(3 * d, d)).astype(np.float32),
        'transformer.h.0.attn.c_attn.bias':
            rng.normal(size=(3 * d,)).astype(np.float32),
        'transformer.h.0.attn.c_proj.weight':
            rng.normal(size=(d, d)).astype(np.float32),
        'transformer.h.0.mlp.w1.weight':
            rng.normal(size=(inter, d)).astype(np.float32),
        'transformer.h.0.mlp.w2.weight':
            rng.normal(size=(inter, d)).astype(np.float32),
        'transformer.h.0.mlp.c_proj.weight':
            rng.normal(size=(d, inter)).astype(np.float32),
        'transformer.h.0.ln_1.weight': np.ones((d,), np.float32),
        'transformer.h.0.ln_2.weight': np.ones((d,), np.float32),
    }
    cfg = ModelConfig(model_name='qwen', head_num=4, kv_head_num=4,
                      size_per_head=8, inter_size=inter, num_layer=nl,
                      vocab_size=v, rotary_embedding=8, attn_bias=True,
                      qkv_bias_only=True, use_dynamic_ntk=True,
                      use_logn_attn=True)
    params = convert_hf_llama(sd, cfg, np.float32)
    assert 'bqkv' in params['layers'] and 'bo' not in params['layers']
    # qwen w2 is the gate (maps to our w1), w1 is up (our w3)
    np.testing.assert_allclose(np.asarray(params['layers']['w1'][0]),
                               sd['transformer.h.0.mlp.w2.weight'].T,
                               rtol=1e-6)


def test_workspace_roundtrip_int4(tmp_path):
    from lmdeploy_tpu.convert.converter import (load_workspace,
                                                save_workspace)
    from lmdeploy_tpu.models.llama import init_params, quantize_params
    cfg = ModelConfig(model_name='tiny', head_num=4, kv_head_num=2,
                      size_per_head=16, inter_size=64, num_layer=2,
                      vocab_size=128, rotary_embedding=16,
                      weight_type='int4', group_size=16)
    params = quantize_params(
        init_params(cfg, jax.random.PRNGKey(0), jnp.float32), cfg, 16)
    save_workspace(str(tmp_path), cfg, params)
    cfg2, _, params2, _ = load_workspace(str(tmp_path))
    assert cfg2.weight_type == 'int4'
    np.testing.assert_array_equal(
        np.asarray(params['layers']['wqkv'].qvals),
        np.asarray(params2['layers']['wqkv'].qvals))


def test_config_from_hf_rope_scaling():
    base = {
        'num_attention_heads': 8, 'hidden_size': 512,
        'num_hidden_layers': 2, 'vocab_size': 1000,
        'max_position_embeddings': 2048,
    }
    cfg = config_from_hf({**base, 'rope_scaling': {
        'type': 'linear', 'factor': 4.0}})
    assert cfg.rope_scaling_type == 'linear'
    assert cfg.rope_scaling_factor == 4.0
    assert cfg.session_len >= 8192  # context extended by the factor

    cfg = config_from_hf({**base, 'rope_scaling': {
        'rope_type': 'yarn', 'factor': 8.0,
        'original_max_position_embeddings': 1024}})
    assert cfg.rope_scaling_type == 'yarn'
    assert cfg.rope_original_max_position == 1024
    assert cfg.session_len >= 8192

    cfg = config_from_hf({**base, 'rope_scaling': {
        'type': 'dynamic', 'factor': 2.0}})
    assert cfg.rope_scaling_type == 'dynamic'
    assert cfg.session_len == 2048  # dynamic grows on the fly

    cfg = config_from_hf(dict(base))
    assert cfg.rope_scaling_type == ''
