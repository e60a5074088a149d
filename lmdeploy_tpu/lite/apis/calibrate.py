"""CLI: calibrate a HF model and save activation/KV stats.

Reference: lmdeploy/lite/apis/calibrate.py:28 — runs calib samples
through the (CPU) model, exports inputs_stats.pth / key_stats.pth /
value_stats.pth; here one ``calib_stats.npz``.
"""
from __future__ import annotations

import os
import os.path as osp


def calibrate(model: str, calib_dataset: str = 'synthetic',
              calib_samples: int = 64, calib_seqlen: int = 512,
              work_dir: str = './work_dir', device: str = 'cpu') -> str:
    """Run calibration; returns the stats file path."""
    import torch
    from transformers import AutoModelForCausalLM, AutoTokenizer

    from ..quantization.calibration import CalibrationContext
    from ..utils.calib_dataloader import get_calib_loaders

    os.makedirs(work_dir, exist_ok=True)
    hf_model = AutoModelForCausalLM.from_pretrained(
        model, torch_dtype=torch.float32, trust_remote_code=True)
    hf_model.eval().to(device)

    try:
        tokenizer = AutoTokenizer.from_pretrained(model, use_fast=True,
                                                  trust_remote_code=True)
        samples = get_calib_loaders(calib_dataset, tokenizer,
                                    nsamples=calib_samples,
                                    seqlen=calib_seqlen)
    except Exception:
        if calib_dataset != 'synthetic':
            raise
        # no tokenizer files (random-weight smoke runs): raw random ids
        gen = torch.Generator().manual_seed(0)
        vocab = hf_model.config.vocab_size
        samples = [torch.randint(0, vocab, (1, calib_seqlen), generator=gen)
                   for _ in range(calib_samples)]
    ctx = CalibrationContext(hf_model, hf_model.config.model_type)
    with ctx:
        for i, ids in enumerate(samples):
            ctx.step(ids.to(device))
            print(f'calibrated sample {i + 1}/{len(samples)}')

    import numpy as np
    out_path = osp.join(work_dir, 'calib_stats.npz')
    np.savez(out_path, **ctx.export())
    print(f'stats -> {out_path}')
    return out_path


def main():
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu.lite calibrate')
    ap.add_argument('model', help='HF model dir')
    ap.add_argument('--calib-dataset', default='synthetic')
    ap.add_argument('--calib-samples', type=int, default=64)
    ap.add_argument('--calib-seqlen', type=int, default=512)
    ap.add_argument('--work-dir', default='./work_dir')
    args = ap.parse_args()
    calibrate(args.model, args.calib_dataset, args.calib_samples,
              args.calib_seqlen, args.work_dir)


if __name__ == '__main__':
    main()
