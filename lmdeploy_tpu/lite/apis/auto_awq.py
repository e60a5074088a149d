"""CLI: AWQ W4A16 quantization straight into a TPU workspace.

Reference: lmdeploy/lite/apis/auto_awq.py:30 — calibrate, smooth
(awq.py:192), per-group INT4 pack into WeightOnlyQLinear modules, save a
quantized HF checkpoint that deploy.py later repacks.  TPU-native: the
smoothed state_dict quantizes directly into the workspace (no
intermediate checkpoint or GPU repack kernels)."""
from __future__ import annotations

import glob
import os.path as osp
import shutil


def auto_awq(model: str, work_dir: str = './work_dir',
             dst: str = './workspace', calib_dataset: str = 'synthetic',
             calib_samples: int = 64, calib_seqlen: int = 512,
             w_bits: int = 4, w_group_size: int = 128,
             stats_path: str = '') -> None:
    import numpy as np
    import torch
    from transformers import AutoModelForCausalLM

    from ...convert.converter import save_workspace
    from ...convert.hf import config_from_hf, convert_hf_llama
    from ...models.llama import quantize_params
    from ..quantization.awq import smooth_state_dict
    from ..quantization.calibration import load_stats
    from .calibrate import calibrate

    assert w_bits == 4, 'only W4A16 is supported (reference parity)'
    if not stats_path:
        stats_path = osp.join(work_dir, 'calib_stats.npz')
        if not osp.exists(stats_path):
            stats_path = calibrate(model, calib_dataset, calib_samples,
                                   calib_seqlen, work_dir)
    inputs, _, _ = load_stats(stats_path)
    act_absmax = {name: st['absmax'] for name, st in inputs.items()}

    hf_model = AutoModelForCausalLM.from_pretrained(
        model, torch_dtype=torch.float32, trust_remote_code=True)
    sd = {k: v.detach().float().numpy()
          for k, v in hf_model.state_dict().items()}
    import json
    with open(osp.join(model, 'config.json')) as f:
        hf_cfg = json.load(f)
    cfg = config_from_hf(hf_cfg, osp.basename(model.rstrip('/')))

    prefix = 'transformer.h' if 'qwen' in cfg.model_name.lower() \
        else 'model.layers'
    smooth_state_dict(sd, cfg.model_name, act_absmax, cfg.num_layer,
                      group_size=w_group_size, layer_prefix=prefix)
    print('AWQ smoothing done')

    params = convert_hf_llama(sd, cfg, np.float32)
    params = quantize_params(params, cfg, w_group_size)
    cfg.weight_type = 'int4'
    cfg.group_size = w_group_size
    save_workspace(dst, cfg, params)
    for fname in ('tokenizer.json', 'tokenizer.model',
                  'tokenizer_config.json', 'special_tokens_map.json'):
        src_f = osp.join(model, fname)
        if osp.exists(src_f):
            shutil.copy(src_f, osp.join(dst, fname))
    print(f'W4A16 workspace -> {dst}')


def main():
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu.lite auto_awq')
    ap.add_argument('model', help='HF model dir')
    ap.add_argument('--work-dir', default='./work_dir')
    ap.add_argument('--dst', default='./workspace')
    ap.add_argument('--calib-dataset', default='synthetic')
    ap.add_argument('--calib-samples', type=int, default=64)
    ap.add_argument('--calib-seqlen', type=int, default=512)
    ap.add_argument('--w-bits', type=int, default=4)
    ap.add_argument('--w-group-size', type=int, default=128)
    args = ap.parse_args()
    auto_awq(args.model, args.work_dir, args.dst, args.calib_dataset,
             args.calib_samples, args.calib_seqlen, args.w_bits,
             args.w_group_size)


if __name__ == '__main__':
    main()
