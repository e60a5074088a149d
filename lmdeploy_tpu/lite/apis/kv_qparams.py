"""CLI: export INT8 KV-cache qparams from calibration stats into a
workspace.

Reference: lmdeploy/lite/apis/kv_qparams.py — per-layer (per-TP-rank)
``past_kv_scale`` binaries: sym = [k_s, v_s] from absmax/127; asym =
[k_scale, k_zp, v_scale, v_zp] with zp = (max+min)/2, scale =
(max-min)/255.  Here the scales land in the workspace config.json
(``kv_scales``: four [L] arrays) — sharding is a load-time concern on
TPU so there are no per-rank files; our cache stores zp in the quantized
domain, so zp_q = zp_float / scale."""
from __future__ import annotations

import json
import os.path as osp

import numpy as np


def kv_qparams(work_dir: str, dst: str, kv_bits: int = 8,
               kv_sym: bool = False,
               stats_path: str = '', per_head: bool = False) -> None:
    from ..quantization.calibration import load_stats

    if kv_bits not in (4, 8):
        raise ValueError(f'kv_bits must be 4 or 8, got {kv_bits} (the '
                         'cache pools store int8 or nibble-packed int4)')
    stats_path = stats_path or osp.join(work_dir, 'calib_stats.npz')
    _, keys, values = load_stats(stats_path)
    nl = len(keys)
    # int8 keeps per-layer scalars (the Pallas attention kernels take
    # per-layer qparams, reference parity).  Per-HEAD [L, KH] qparams
    # (int4 pools only — they read through the XLA path where the finer
    # granularity broadcasts for free) are OPT-IN: measured on the
    # trained proxy they LOWER reconstruction MSE but RAISE ppl
    # (11.4731 vs 11.4371 per-layer) — the narrower per-head ranges clip
    # out-of-calibration outlier K dims that attention is most sensitive
    # to, while the per-layer envelope never clips harder than
    # calibration saw.  Stats are per-(head, dim): reduce over dim only.
    if per_head and kv_bits != 4:
        raise ValueError('per-head kv qparams require kv_bits=4 '
                         '(int8 attention kernels take per-layer scalars)')
    kh = keys[0]['absmax'].shape[0]
    shape = (nl, kh) if per_head else (nl,)
    k_scale = np.zeros(shape, np.float32)
    k_zp = np.zeros(shape, np.float32)
    v_scale = np.zeros(shape, np.float32)
    v_zp = np.zeros(shape, np.float32)
    qmax = 2 ** (kv_bits - 1) - 1       # 127 / 7
    span = 2 ** kv_bits - 1             # 255 / 15
    red = (lambda a: a.max(axis=1)) if per_head else (lambda a: a.max())
    red_min = (lambda a: a.min(axis=1)) if per_head else (lambda a: a.min())
    for i in range(nl):
        if kv_sym:
            k_scale[i] = red(keys[i]['absmax']) / qmax
            v_scale[i] = red(values[i]['absmax']) / qmax
        else:
            kmin, kmax = red_min(keys[i]['min']), red(keys[i]['max'])
            vmin, vmax = red_min(values[i]['min']), red(values[i]['max'])
            k_scale[i] = (kmax - kmin) / span
            v_scale[i] = (vmax - vmin) / span
            # Cache stores zp in the quantized domain and uses
            # q = f/scale + zp (kvcache/paged.py:70), so mapping the
            # float midpoint to q=0 needs zp_q = -mid/scale.  The
            # reference stores the float-domain zp = +mid and computes
            # q = (f - zp)/scale (lmdeploy/lite/apis/kv_qparams.py) —
            # same affine map, opposite sign convention.
            k_zp[i] = -((kmax + kmin) / 2) / np.maximum(k_scale[i], 1e-12)
            v_zp[i] = -((vmax + vmin) / 2) / np.maximum(v_scale[i], 1e-12)
        print(f'layer {i}: k_scale={np.mean(k_scale[i]):.6f} '
              f'k_zp={np.mean(k_zp[i]):.3f} '
              f'v_scale={np.mean(v_scale[i]):.6f} '
              f'v_zp={np.mean(v_zp[i]):.3f}'
              + (' (per-head)' if per_head else ''))

    cfg_path = osp.join(dst, 'config.json')
    with open(cfg_path) as f:
        payload = json.load(f)
    payload['kv_scales'] = [k_scale.tolist(), k_zp.tolist(),
                            v_scale.tolist(), v_zp.tolist()]
    engine = payload.setdefault('engine', {})
    if kv_bits == 4:                 # beyond-reference nibble-packed pool
        engine['quant_policy'] = 8
        engine['kv_dtype'] = 'int4'
    else:
        engine['quant_policy'] = 4   # QuantPolicy::kCacheKVInt8
        engine['kv_dtype'] = 'int8'
    with open(cfg_path, 'w') as f:
        json.dump(payload, f, indent=2)
    print(f'kv qparams -> {cfg_path}')


def main():
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu.lite kv_qparams')
    ap.add_argument('work_dir')
    ap.add_argument('dst', help='workspace dir to update')
    ap.add_argument('--kv-bits', type=int, default=8)
    ap.add_argument('--kv-sym', action='store_true')
    ap.add_argument('--per-head', action='store_true',
                    help='per-head [L, KH] qparams (int4 only; measured '
                         'worse ppl than per-layer on the proxy — see '
                         'docs/kv_int8.md)')
    args = ap.parse_args()
    kv_qparams(args.work_dir, args.dst, args.kv_bits, args.kv_sym,
               per_head=args.per_head)


if __name__ == '__main__':
    main()
