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


def measure_mm_regime(cfg, m: int, iters: int = 20,
                      repeats: int = 3) -> dict:
    """Measure both quantized-matmul regimes at batch-row count ``m`` for
    the model's GEMM shapes — the reference's Measure autotune analogue
    (gemm_s4_f16.cu:98-169 times every kernel in its zoo per shape).
    Returns {'group': ms, 'dequant': ms} per-call totals.

    Timing discipline (CLAUDE.md hard-won facts): the host<->TPU link
    costs ~35 ms per round trip, so each measurement subtracts an
    empty-fori-loop baseline and takes the min of ``repeats`` wall
    timings of one in-jit ``iters``-long loop."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from lmdeploy_tpu.ops.linear import (QuantizedWeight, quant_matmul,
                                         quant_matmul_dequant)

    d, dh = cfg.hidden_size, cfg.size_per_head
    shapes = [(d, (cfg.head_num + 2 * cfg.kv_head_num) * dh),
              (cfg.head_num * dh, d), (d, cfg.inter_size),
              (d, cfg.inter_size), (cfg.inter_size, d)]
    g = cfg.group_size or 128

    def timed(fn):
        np.asarray(fn())  # compile
        best = min(_time_once(fn) for _ in range(repeats))
        return best

    def _time_once(fn):
        t0 = time.perf_counter()
        np.asarray(fn())
        return time.perf_counter() - t0

    @jax.jit
    def empty(x=jnp.zeros((8, 8), jnp.float32)):
        def step(i, acc):
            return acc
        return jax.lax.fori_loop(0, iters, step, x)
    rtt = timed(empty)

    out = {}
    for name, mm in (('group', quant_matmul),
                     ('dequant', quant_matmul_dequant)):
        total = 0.0
        for k, n in shapes:
            qw = QuantizedWeight(
                qvals=jnp.asarray(
                    np.random.randint(0, 16, (k, n)), jnp.uint8),
                scales=jnp.full((k // g, n), 0.002, jnp.bfloat16),
                zeros=jnp.full((k // g, n), 8.0, jnp.bfloat16))
            x = jnp.asarray(np.random.randn(m, k), jnp.bfloat16)

            @jax.jit
            def run(x=x, qw=qw, mm=mm):
                def step(i, acc):
                    return acc + mm(x + i.astype(jnp.bfloat16), qw)
                return jax.lax.fori_loop(0, iters, step,
                                         jnp.zeros((m, n), jnp.float32))
            total += max(timed(run) - rtt, 0.0) / iters
        out[name] = total * 1e3
    return out


def _gemm_shapes(cfg):
    """The five per-layer GEMM (K, N) shapes: wqkv, wo, w1, w3, w2."""
    d, dh = cfg.hidden_size, cfg.size_per_head
    return [(d, (cfg.head_num + 2 * cfg.kv_head_num) * dh),
            (cfg.head_num * dh, d), (d, cfg.inter_size),
            (d, cfg.inter_size), (cfg.inter_size, d)]


def measure_packed_block_n(cfg, m: int, block_n: int,
                           iters: int = 20) -> float:
    """Time the packed-int4 Pallas kernel at (m, block_n) over the
    model's GEMM shapes — the reference's Measure over its tile zoo
    (gemm_s4_f16.cu:98-169).  Returns total ms per call."""
    import numpy as np

    import jax
    import jax.numpy as jnp
    from lmdeploy_tpu.ops.pallas.quant_matmul import (pack_nibbles,
                                                      packed_int4_matmul)

    shapes = _gemm_shapes(cfg)
    g = cfg.group_size or 128
    total = 0.0
    for k, n in shapes:
        packed = jnp.asarray(pack_nibbles(
            np.random.randint(0, 256, (1, k, n)).astype(np.uint8)
            & 0xF))
        scales = jnp.full((1, k // g, n), 0.002, jnp.bfloat16)
        x = jnp.asarray(np.random.randn(m, k), jnp.bfloat16)

        @jax.jit
        def run(x=x, packed=packed, scales=scales, block_n=block_n):
            def step(i, acc):
                return acc + packed_int4_matmul(
                    x + i.astype(jnp.bfloat16), packed, scales, 0,
                    block_n=block_n)
            return jax.lax.fori_loop(0, iters, step,
                                     jnp.zeros((m, n), jnp.float32))
        import numpy as _np
        _np.asarray(run())  # compile
        t0 = time.perf_counter()
        _np.asarray(run())
        total += (time.perf_counter() - t0) / iters
    return total * 1e3


def tune_packed(cfg, model_path: str, write: bool,
                ms=(1, 4, 8, 16, 32, 64, 512),
                block_ns=(None, 512, 2048)) -> dict:
    """Sweep the packed kernel's N tile per (shape, M-bucket) and persist
    winners into the workspace's mm_tune.json (the repo's gemm_config.in
    equivalent — reference: generate_gemm_config.py writes the sweep
    result consumed at engine start).  ``None`` is the kernel's
    VMEM-budget auto pick (full-N rows when they fit — the measured
    decode-M winner, 900 vs 88.7 GB/s); explicit tiles stay in the
    sweep for shard shapes where full rows exceed the budget.  M=512
    covers the prefill regime of the M-blocked kernel."""
    from lmdeploy_tpu.ops.linear import tune_key

    shapes = _gemm_shapes(cfg)
    table = {}
    for m in ms:
        per_bn = {}
        for bn in block_ns:
            per_bn[bn] = measure_packed_block_n(cfg, m, bn)
            print(f'M={m:3d} block_n={bn!s:>5}: {per_bn[bn]:8.2f} ms',
                  flush=True)
        best = min(per_bn, key=per_bn.get)
        # the sweep times all shapes together; record the winner per shape
        # key so per-shape loads still resolve; the auto pick (None)
        # writes no entry — absent key == auto at load time
        if best is not None:
            for k, n in shapes:
                table[tune_key(k, n, m)] = best
        print(f'M={m}: best block_n={best}')
    if write:
        path = _osp.join(model_path, 'mm_tune.json')
        with open(path, 'w') as f:
            json.dump(table, f, indent=1)
        print(f'wrote {len(table)} entries -> {path}')
    return table


def main():
    ap = argparse.ArgumentParser('engine autotune')
    ap.add_argument('model_path')
    ap.add_argument('--step-lengths', type=int, nargs='+',
                    default=[1, 4, 8, 16, 32, 64])
    ap.add_argument('--mm-regime', action='store_true',
                    help='also sweep the quantized-matmul regime '
                         'threshold over M (decode vs prefill row '
                         'counts) and report the crossover')
    ap.add_argument('--packed', action='store_true',
                    help='sweep the packed-int4 Pallas kernel N tile '
                         'per M-bucket and write mm_tune.json')
    ap.add_argument('--write', action='store_true',
                    help='write the best step_length into config.json')
    args = ap.parse_args()

    if args.packed:
        from lmdeploy_tpu.convert.converter import load_workspace
        model_cfg = load_workspace(args.model_path)[0]
        tune_packed(model_cfg, args.model_path, args.write)
        return

    from lmdeploy_tpu.api import build_engine
    engine = build_engine(args.model_path)
    best, best_tps = None, 0.0
    for s in args.step_lengths:
        tps = measure_decode(engine, s)
        print(f'step_length={s:3d}: {tps:8.1f} tok/s')
        if tps > best_tps:
            best, best_tps = s, tps
    print(f'best: step_length={best} ({best_tps:.1f} tok/s)')
    model_cfg = engine.cfg
    engine.shutdown()

    crossover = None
    if args.mm_regime and model_cfg.weight_type == 'int4':
        prev = None
        for m in (1, 8, 32, 64, 128, 256, 512):
            r = measure_mm_regime(model_cfg, m)
            pick = min(r, key=r.get)
            print(f'M={m:4d}: group={r["group"]:7.2f}ms '
                  f'dequant={r["dequant"]:7.2f}ms -> {pick}')
            if pick == 'dequant' and prev == 'group' and crossover is None:
                crossover = m
            prev = pick
        if crossover:
            print(f'regime crossover at M={crossover} '
                  f'(export LMDEPLOY_TPU_DEQUANT_MIN_M={crossover})')

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
