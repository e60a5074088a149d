"""Engine autotuner — measure-and-pick for scheduler knobs.

Counterpart of the reference's offline GEMM sweep
(lmdeploy/serve/turbomind/generate_gemm_config.py + utils/gemm_test:
sweep batch sizes, write gemm_config.in consumed at engine start).  On
TPU the XLA compiler owns GEMM tiling, so the tunable surface is the
SCHEDULER: step_length (decode steps per dispatch — trades host-link
amortization vs stop-detection lag) and prefill bucket sizes.  Writes
the winning values into the workspace's config.json engine section.
"""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import time


def measure_decode(engine, steps: int, tokens: int = 96) -> float:
    """tok/s at a given step_length."""
    from lmdeploy_tpu.messages import GenerationConfig
    engine.ecfg.step_length = steps
    inst = engine.create_instance()
    gen = GenerationConfig(max_new_tokens=tokens, top_k=1, ignore_eos=True)
    inst.infer(9_000 + steps, [1], gen_config=gen, sequence_end=True)  # warm
    t0 = time.perf_counter()
    out = inst.infer(9_500 + steps, [1], gen_config=gen, sequence_end=True)
    return out.num_generated / (time.perf_counter() - t0)


def main():
    ap = argparse.ArgumentParser('engine autotune')
    ap.add_argument('model_path')
    ap.add_argument('--step-lengths', type=int, nargs='+',
                    default=[1, 4, 8, 16, 32, 64])
    ap.add_argument('--write', action='store_true',
                    help='write the best step_length into config.json')
    args = ap.parse_args()

    from lmdeploy_tpu.api import build_engine
    engine = build_engine(args.model_path)
    best, best_tps = None, 0.0
    for s in args.step_lengths:
        tps = measure_decode(engine, s)
        print(f'step_length={s:3d}: {tps:8.1f} tok/s')
        if tps > best_tps:
            best, best_tps = s, tps
    print(f'best: step_length={best} ({best_tps:.1f} tok/s)')
    engine.shutdown()

    if args.write:
        cfg_path = _osp.join(args.model_path, 'config.json')
        with open(cfg_path) as f:
            payload = json.load(f)
        payload.setdefault('engine', {})['step_length'] = best
        with open(cfg_path, 'w') as f:
            json.dump(payload, f, indent=2)
        print(f'wrote step_length={best} -> {cfg_path}')


if __name__ == '__main__':
    main()
