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
               stats_path: str = '') -> None:
    from ..quantization.calibration import load_stats

    stats_path = stats_path or osp.join(work_dir, 'calib_stats.npz')
    _, keys, values = load_stats(stats_path)
    nl = len(keys)
    k_scale = np.zeros((nl,), np.float32)
    k_zp = np.zeros((nl,), np.float32)
    v_scale = np.zeros((nl,), np.float32)
    v_zp = np.zeros((nl,), np.float32)
    qmax = 2 ** (kv_bits - 1) - 1       # 127
    span = 2 ** kv_bits - 1             # 255
    for i in range(nl):
        if kv_sym:
            k_scale[i] = keys[i]['absmax'].max() / qmax
            v_scale[i] = values[i]['absmax'].max() / qmax
        else:
            kmin, kmax = keys[i]['min'].min(), keys[i]['max'].max()
            vmin, vmax = values[i]['min'].min(), values[i]['max'].max()
            k_scale[i] = (kmax - kmin) / span
            v_scale[i] = (vmax - vmin) / span
            # Cache stores zp in the quantized domain and uses
            # q = f/scale + zp (kvcache/paged.py:70), so mapping the
            # float midpoint to q=0 needs zp_q = -mid/scale.  The
            # reference stores the float-domain zp = +mid and computes
            # q = (f - zp)/scale (lmdeploy/lite/apis/kv_qparams.py) —
            # same affine map, opposite sign convention.
            k_zp[i] = -((kmax + kmin) / 2) / max(k_scale[i], 1e-12)
            v_zp[i] = -((vmax + vmin) / 2) / max(v_scale[i], 1e-12)
        print(f'layer {i}: k_scale={k_scale[i]:.6f} k_zp={k_zp[i]:.3f} '
              f'v_scale={v_scale[i]:.6f} v_zp={v_zp[i]:.3f}')

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
    args = ap.parse_args()
    kv_qparams(args.work_dir, args.dst, args.kv_bits, args.kv_sym)


if __name__ == '__main__':
    main()
