"""AWQ-quantized HF checkpoint import.

Reference: lmdeploy/serve/turbomind/deploy.py deploy_awq (:554-783) repacks
AWQ qweight/qzeros/scales into the gemm_s4_f16 interleaved GPU layout via
CUDA ops (bind.cpp:414-465).  Here we repack into this framework's
nibble-split-K uint8 layout (ops/linear.py) for the Pallas W4A16 kernel.

AWQ GEMM tensor formats (from the llm-awq project):
  qweight: int32 [K, N/8]  — 8 uint4 values per int32 along N, order
           [0, 2, 4, 6, 1, 3, 5, 7]
  qzeros:  int32 [K/g, N/8] — same packing
  scales:  fp16  [K/g, N]
Dequant: w[k, n] = (qweight[k, n] - qzeros[k//g, n]) * scales[k//g, n].
"""
from __future__ import annotations

import json
import os.path as osp
from typing import Dict

import numpy as np

AWQ_ORDER = np.array([0, 2, 4, 6, 1, 3, 5, 7])
AWQ_INV = np.argsort(AWQ_ORDER)  # position of logical nibble i in packed word


def unpack_awq_int32(packed: np.ndarray) -> np.ndarray:
    """int32 [..., W] -> uint4-as-uint8 [..., W*8] in logical N order."""
    u = packed.astype(np.uint32)
    nibbles = np.stack([(u >> (4 * i)) & 0xF for i in range(8)], axis=-1)
    # nibble slot i holds logical element AWQ_ORDER[i]; invert
    nibbles = nibbles[..., AWQ_INV]
    return nibbles.reshape(*packed.shape[:-1], packed.shape[-1] * 8) \
        .astype(np.uint8)


def awq_to_quantized_weight(qweight: np.ndarray, qzeros: np.ndarray,
                            scales: np.ndarray):
    """AWQ GEMM tensors -> QuantizedWeight (byte-per-value runtime layout)."""
    import jax.numpy as jnp
    from ..ops.linear import QuantizedWeight
    q = unpack_awq_int32(qweight)           # [K, N] uint8 0..15
    z = unpack_awq_int32(qzeros)            # [K/g, N]
    s = np.asarray(scales, np.float32)      # [K/g, N]
    import ml_dtypes
    return QuantizedWeight(
        qvals=jnp.asarray(q),
        scales=jnp.asarray(s.astype(ml_dtypes.bfloat16)),
        zeros=jnp.asarray(z.astype(np.float32).astype(ml_dtypes.bfloat16)),
    )


def convert_awq(model_path: str, dst: str, model_name: str = '',
                group_size: int = 128) -> None:
    """AWQ HF dir (qweight/qzeros/scales linears) -> W4A16 workspace."""
    import glob

    import jax.numpy as jnp

    from ..ops.linear import QuantizedWeight
    from .converter import save_workspace
    from .hf import config_from_hf

    with open(osp.join(model_path, 'config.json')) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, model_name or
                         osp.basename(model_path.rstrip('/')))
    cfg.weight_type = 'int4'
    cfg.group_size = group_size

    sd: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(osp.join(model_path, '*.safetensors')))
    if st_files:
        from safetensors.numpy import load_file
        for fp in st_files:
            sd.update(load_file(fp))
    else:
        import torch
        for fp in sorted(glob.glob(osp.join(model_path, 'pytorch_model*.bin'))):
            for k, v in torch.load(fp, map_location='cpu',
                                   weights_only=True).items():
                sd[k] = v.float().numpy() if v.dtype == torch.bfloat16 \
                    else v.numpy()

    def qlinear(prefix) -> QuantizedWeight:
        return awq_to_quantized_weight(
            sd[f'{prefix}.qweight'], sd[f'{prefix}.qzeros'],
            sd[f'{prefix}.scales'])

    def cat_q(*qws: 'QuantizedWeight') -> 'QuantizedWeight':
        """Column-concat quantized weights (fuse q,k,v)."""
        return QuantizedWeight(
            qvals=jnp.concatenate([q.qvals for q in qws], axis=-1),
            scales=jnp.concatenate([q.scales for q in qws], axis=-1),
            zeros=jnp.concatenate([q.zeros for q in qws], axis=-1))

    def stack_q(qws):
        return QuantizedWeight(
            qvals=jnp.stack([q.qvals for q in qws]),
            scales=jnp.stack([q.scales for q in qws]),
            zeros=jnp.stack([q.zeros for q in qws]))

    import ml_dtypes

    def dense(name):
        return jnp.asarray(np.asarray(sd[name], np.float32)
                           .astype(ml_dtypes.bfloat16))

    wqkv, wo, w1, w3, w2, an, fn_, bqkv = [], [], [], [], [], [], [], []
    for i in range(cfg.num_layer):
        p = f'model.layers.{i}'
        wqkv.append(cat_q(qlinear(f'{p}.self_attn.q_proj'),
                          qlinear(f'{p}.self_attn.k_proj'),
                          qlinear(f'{p}.self_attn.v_proj')))
        wo.append(qlinear(f'{p}.self_attn.o_proj'))
        w1.append(qlinear(f'{p}.mlp.gate_proj'))
        w3.append(qlinear(f'{p}.mlp.up_proj'))
        w2.append(qlinear(f'{p}.mlp.down_proj'))
        an.append(np.asarray(sd[f'{p}.input_layernorm.weight'], np.float32))
        fn_.append(np.asarray(sd[f'{p}.post_attention_layernorm.weight'],
                              np.float32))
        if f'{p}.self_attn.q_proj.bias' in sd:
            cfg.attn_bias = True
            bqkv.append(np.concatenate([
                np.asarray(sd[f'{p}.self_attn.q_proj.bias'], np.float32),
                np.asarray(sd[f'{p}.self_attn.k_proj.bias'], np.float32),
                np.asarray(sd[f'{p}.self_attn.v_proj.bias'], np.float32)]))

    from ..models.llama import vocab_padded
    vp = vocab_padded(cfg)
    emb = np.asarray(sd['model.embed_tokens.weight'], np.float32)
    if emb.shape[0] < vp:
        emb = np.pad(emb, ((0, vp - emb.shape[0]), (0, 0)))
    head = np.asarray(sd['lm_head.weight'], np.float32).T
    if head.shape[1] < vp:
        head = np.pad(head, ((0, 0), (0, vp - head.shape[1])))

    layers = {
        'attn_norm': jnp.asarray(np.stack(an).astype(ml_dtypes.bfloat16)),
        'ffn_norm': jnp.asarray(np.stack(fn_).astype(ml_dtypes.bfloat16)),
        'wqkv': stack_q(wqkv), 'wo': stack_q(wo),
        'w1': stack_q(w1), 'w3': stack_q(w3), 'w2': stack_q(w2),
    }
    if bqkv:
        layers['bqkv'] = jnp.asarray(
            np.stack(bqkv).astype(ml_dtypes.bfloat16))
    params = {
        'tok_embedding': jnp.asarray(emb.astype(ml_dtypes.bfloat16)),
        'norm': jnp.asarray(np.asarray(sd['model.norm.weight'], np.float32)
                            .astype(ml_dtypes.bfloat16)),
        'lm_head': jnp.asarray(head.astype(ml_dtypes.bfloat16)),
        'layers': layers,
    }
    save_workspace(dst, cfg, params)
    import shutil
    for fname in ('tokenizer.json', 'tokenizer.model',
                  'tokenizer_config.json', 'special_tokens_map.json'):
        src_f = osp.join(model_path, fname)
        if osp.exists(src_f):
            shutil.copy(src_f, osp.join(dst, fname))


__all__ = ['unpack_awq_int32', 'awq_to_quantized_weight', 'convert_awq']
