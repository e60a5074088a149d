"""Generation profiler: first-token latency + per-token latency + tok/s.

Reference: benchmark/profile_generation.py:137-153 — sweeps (batch,
input_len, output_len) combos, reports first-token latency min/max/avg,
per-token latency percentiles and token throughput, plus a memory
monitor.  TPU memory comes from device.memory_stats() when the backend
exposes it."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import csv
import time
from dataclasses import dataclass
from typing import List

import numpy as np


@dataclass
class Result:
    batch: int
    input_len: int
    output_len: int
    first_token_ms: float
    percentiles_ms: List[float]     # p50 / p75 / p95 / p99 per-token
    throughput_tok_s: float
    mem_gb: float


def profile_one(engine, batch: int, input_len: int, output_len: int,
                warmup: int = 1) -> Result:
    import jax
    from lmdeploy_tpu.messages import GenerationConfig

    gen = GenerationConfig(max_new_tokens=output_len, top_k=1,
                           ignore_eos=True)
    rng = np.random.default_rng(0)

    def run(sid_base):
        import threading
        stamps = [[] for _ in range(batch)]

        def worker(i):
            inst = engine.create_instance()
            ids = rng.integers(3, engine.cfg.vocab_size - 1,
                               size=max(1, input_len)).tolist()
            last = 0
            for out in inst.stream_infer(sid_base + i, ids, gen,
                                         sequence_end=True):
                now = time.perf_counter()
                for _ in range(out.num_generated - last):
                    stamps[i].append(now)
                last = out.num_generated

        ts = [threading.Thread(target=worker, args=(i,))
              for i in range(batch)]
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        t_end = time.perf_counter()
        return t0, t_end, stamps

    for w in range(warmup):
        run(10_000 * (w + 1))
    t0, t_end, stamps = run(0)

    firsts = [(s[0] - t0) * 1e3 for s in stamps if s]
    gaps = []
    for s in stamps:
        gaps.extend(np.diff(s) * 1e3)
    total_tokens = sum(len(s) for s in stamps)
    mem = 0.0
    try:
        stats = jax.devices()[0].memory_stats()
        if stats:
            mem = stats.get('bytes_in_use', 0) / 2 ** 30
    except Exception:
        pass
    return Result(
        batch=batch, input_len=input_len, output_len=output_len,
        first_token_ms=float(np.mean(firsts)) if firsts else 0.0,
        percentiles_ms=[float(np.percentile(gaps, p)) if len(gaps) else 0.0
                        for p in (50, 75, 95, 99)],
        throughput_tok_s=total_tokens / (t_end - t0),
        mem_gb=mem)


def main():
    ap = argparse.ArgumentParser('profile_generation')
    ap.add_argument('model_path')
    ap.add_argument('--concurrency', '-c', type=int, nargs='+',
                    default=[1, 8])
    ap.add_argument('--prompt-tokens', '-p', type=int, nargs='+',
                    default=[1, 128])
    ap.add_argument('--completion-tokens', '-o', type=int, nargs='+',
                    default=[128])
    ap.add_argument('--tp', type=int, default=1)
    ap.add_argument('--csv', default='')
    args = ap.parse_args()

    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    engine = build_engine(args.model_path,
                          engine_config=None if args.tp == 1
                          else EngineConfig(tp=args.tp))
    rows = []
    for b in args.concurrency:
        for i in args.prompt_tokens:
            for o in args.completion_tokens:
                r = profile_one(engine, b, i, o)
                p50, p75, p95, p99 = r.percentiles_ms
                print(f'batch={b} in={i} out={o}: '
                      f'FTL {r.first_token_ms:.1f}ms, per-token p50 '
                      f'{p50:.1f} p95 {p95:.1f} p99 {p99:.1f} ms, '
                      f'{r.throughput_tok_s:.1f} tok/s, mem {r.mem_gb:.1f}GB')
                rows.append(r)
    engine.shutdown()
    if args.csv:
        with open(args.csv, 'w', newline='') as f:
            w = csv.writer(f)
            w.writerow(['batch', 'input', 'output', 'first_token_ms',
                        'p50_ms', 'p75_ms', 'p95_ms', 'p99_ms', 'tok_s',
                        'mem_gb'])
            for r in rows:
                w.writerow([r.batch, r.input_len, r.output_len,
                            round(r.first_token_ms, 2),
                            *[round(x, 2) for x in r.percentiles_ms],
                            round(r.throughput_tok_s, 2),
                            round(r.mem_gb, 2)])


if __name__ == '__main__':
    main()
