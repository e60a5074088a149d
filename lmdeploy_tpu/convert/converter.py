"""Workspace converter — offline checkpoint preparation.

Reference: lmdeploy/serve/turbomind/deploy.py converts HF/meta/AWQ
checkpoints to a TurboMind workspace of per-rank .bin files + config.ini.
Here a workspace is a directory of flat safetensors (bf16 via ml_dtypes)
plus one config.json; sharding happens at load time through jax.sharding,
so there are no per-rank files.

Supports:
- hf:   fp16/bf16 HF llama-family dirs -> bf16 workspace
- awq:  AWQ-quantized HF dirs (qweight/qzeros/scales) -> W4A16 workspace
- quantize: on-the-fly min/max int4 quantization of an fp checkpoint
  (for benchmarking; real AWQ search lives in lmdeploy_tpu.lite)
- random: fabricate a random-weight workspace from a preset (tests/bench)
"""
from __future__ import annotations

import dataclasses
import json
import os
import os.path as osp
from typing import Any, Dict, Optional

import numpy as np

from ..config import EngineConfig, ModelConfig
from ..models.llama import init_params, quantize_params
from ..ops.linear import QuantizedWeight

try:
    import ml_dtypes
    BF16 = ml_dtypes.bfloat16
except ImportError:  # pragma: no cover
    BF16 = np.float32

PRESETS = {
    'tiny': dict(head_num=4, kv_head_num=2, size_per_head=32, inter_size=256,
                 num_layer=2, vocab_size=512, rotary_embedding=32,
                 max_position_embeddings=512, session_len=512),
    'llama2-7b': dict(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=4096),
    'llama2-13b': dict(head_num=40, kv_head_num=40, size_per_head=128,
                       inter_size=13824, num_layer=40, vocab_size=32000,
                       rotary_embedding=128, max_position_embeddings=4096,
                       session_len=4096),
    'internlm-7b': dict(head_num=32, kv_head_num=32, size_per_head=128,
                        inter_size=11008, num_layer=32, vocab_size=103168,
                        rotary_embedding=128, attn_bias=True,
                        max_position_embeddings=2048, session_len=2048),
    'llama2-70b': dict(head_num=64, kv_head_num=8, size_per_head=128,
                       inter_size=28672, num_layer=80, vocab_size=32000,
                       rotary_embedding=128, max_position_embeddings=4096,
                       session_len=4096),
    'qwen-7b': dict(head_num=32, kv_head_num=32, size_per_head=128,
                    inter_size=11008, num_layer=32, vocab_size=151936,
                    rotary_embedding=128, max_position_embeddings=8192,
                    session_len=8192, attn_bias=True, qkv_bias_only=True,
                    use_dynamic_ntk=True, use_logn_attn=True),
}


def _flatten(params: Dict[str, Any], prefix: str = '') -> Dict[str, np.ndarray]:
    """Flatten the params pytree to string-keyed numpy arrays."""
    import jax.numpy as jnp
    out = {}
    for k, v in params.items():
        key = f'{prefix}{k}'
        if isinstance(v, dict):
            out.update(_flatten(v, key + '/'))
        elif isinstance(v, QuantizedWeight):
            # disk format is truly 4-bit packed; HBM format is byte-per-value
            from ..ops.linear import pack_int4
            out[key + '.packed'] = pack_int4(np.asarray(v.qvals))
            out[key + '.scales'] = np.asarray(v.scales).astype(BF16)
            out[key + '.zeros'] = np.asarray(v.zeros).astype(BF16)
        else:
            arr = np.asarray(v)
            if arr.dtype == np.float32 or str(arr.dtype) == 'float32':
                arr = arr.astype(BF16)
            out[key] = arr
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
    import jax.numpy as jnp
    tree: Dict[str, Any] = {}
    qparts: Dict[str, Dict[str, np.ndarray]] = {}
    for key, arr in flat.items():
        if key.endswith(('.packed', '.scales', '.zeros')):
            base, part = key.rsplit('.', 1)
            qparts.setdefault(base, {})[part] = arr
            continue
        parts = key.split('/')
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(arr)
    for base, parts_d in qparts.items():
        path = base.split('/')
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        from ..ops.linear import unpack_int4
        node[path[-1]] = QuantizedWeight(
            qvals=jnp.asarray(unpack_int4(parts_d['packed'])),
            scales=jnp.asarray(parts_d['scales']),
            zeros=jnp.asarray(parts_d['zeros']))
    return tree


def save_workspace(dst: str, cfg: ModelConfig, params: Dict[str, Any],
                   engine_cfg: Optional[EngineConfig] = None,
                   kv_scales=None) -> None:
    os.makedirs(dst, exist_ok=True)
    from safetensors.numpy import save_file
    flat = _flatten(params)
    save_file(flat, osp.join(dst, 'weights.safetensors'))
    payload = {'model': dataclasses.asdict(cfg)}
    if engine_cfg is not None:
        d = dataclasses.asdict(engine_cfg)
        d['prefill_buckets'] = list(d['prefill_buckets'])
        payload['engine'] = d
    if kv_scales is not None:
        payload['kv_scales'] = [np.asarray(x).tolist() for x in kv_scales]
    with open(osp.join(dst, 'config.json'), 'w') as f:
        json.dump(payload, f, indent=2)


def load_workspace(src: str):
    """Returns (ModelConfig, EngineConfig|None, params, kv_scales|None)."""
    from safetensors.numpy import load_file
    with open(osp.join(src, 'config.json')) as f:
        payload = json.load(f)
    cfg = ModelConfig.from_dict(payload['model'])
    ecfg = None
    if 'engine' in payload:
        d = payload['engine']
        d['prefill_buckets'] = tuple(d.get('prefill_buckets', (128, 512, 2048)))
        known = {f.name for f in dataclasses.fields(EngineConfig)}
        ecfg = EngineConfig(**{k: v for k, v in d.items() if k in known})
    flat = load_file(osp.join(src, 'weights.safetensors'))
    params = _unflatten(flat)
    kv_scales = payload.get('kv_scales')
    return cfg, ecfg, params, kv_scales


def is_workspace(path: str) -> bool:
    return osp.exists(osp.join(path, 'weights.safetensors'))


def convert_hf(model_path: str, dst: str, model_name: str = '',
               quantize: bool = False, group_size: int = 128) -> None:
    """HF dir -> workspace (optionally min/max W4A16-quantized)."""
    from .hf import load_hf_dir
    cfg, params = load_hf_dir(model_path, np.float32)
    if model_name:
        cfg.model_name = model_name
    if quantize:
        params = quantize_params(params, cfg, group_size)
        cfg.weight_type = 'int4'
        cfg.group_size = group_size
    else:
        cfg.weight_type = 'bf16'
    save_workspace(dst, cfg, params)
    # carry tokenizer files over if present
    import shutil
    for fname in ('tokenizer.json', 'tokenizer.model', 'tokenizer_config.json',
                  'special_tokens_map.json'):
        src_f = osp.join(model_path, fname)
        if osp.exists(src_f):
            shutil.copy(src_f, osp.join(dst, fname))


def make_random_workspace(dst: str, preset: str = 'tiny',
                          weight_type: str = 'bf16', seed: int = 0,
                          group_size: int = 128,
                          model_name: str = '') -> ModelConfig:
    """Random-weight workspace for tests and benchmarks (no checkpoints in
    this environment).  Runs on CPU: an offline converter must not claim
    accelerator HBM (a 7B bf16 init would fill the chip)."""
    import jax
    import jax.numpy as jnp
    try:
        cpu = jax.devices('cpu')[0]
    except RuntimeError:
        cpu = None
    if cpu is not None:
        with jax.default_device(cpu):
            return _make_random_workspace(dst, preset, weight_type, seed,
                                          group_size, model_name)
    return _make_random_workspace(dst, preset, weight_type, seed,
                                  group_size, model_name)


def _make_random_workspace(dst, preset, weight_type, seed, group_size,
                           model_name) -> ModelConfig:
    import jax
    import jax.numpy as jnp
    cfg = ModelConfig(model_name=model_name or preset, **PRESETS[preset])
    dtype = jnp.bfloat16
    params = init_params(cfg, jax.random.PRNGKey(seed), dtype)
    if weight_type == 'int4':
        params = quantize_params(params, cfg, group_size)
        cfg.weight_type = 'int4'
        cfg.group_size = group_size
    save_workspace(dst, cfg, params)
    return cfg


def main(argv=None):
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu.convert')
    ap.add_argument('model_path', nargs='?', help='HF model dir')
    ap.add_argument('dst', help='output workspace dir')
    ap.add_argument('--model-name', default='')
    ap.add_argument('--model-format', choices=['hf', 'awq'], default='hf')
    ap.add_argument('--quantize', action='store_true',
                    help='min/max W4A16 quantization during conversion')
    ap.add_argument('--group-size', type=int, default=128)
    ap.add_argument('--random', default='',
                    help=f'fabricate random weights: {sorted(PRESETS)}')
    ap.add_argument('--weight-type', choices=['bf16', 'int4'], default='bf16')
    args = ap.parse_args(argv)
    if args.random:
        cfg = make_random_workspace(args.dst, args.random, args.weight_type,
                                    group_size=args.group_size,
                                    model_name=args.model_name)
        print(f'random {args.random} ({cfg.weight_type}) -> {args.dst}')
        return
    if args.model_format == 'awq':
        from .awq import convert_awq
        convert_awq(args.model_path, args.dst, args.model_name,
                    args.group_size)
    else:
        convert_hf(args.model_path, args.dst, args.model_name,
                   quantize=args.quantize, group_size=args.group_size)
    print(f'{args.model_path} -> {args.dst}')


if __name__ == '__main__':
    main()
