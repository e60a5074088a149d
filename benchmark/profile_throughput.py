"""Offline throughput profiler over a request trace.

Reference: benchmark/profile_throughput.py:136-138 — replays ShareGPT
conversations against the engine with N concurrent client threads and
reports total & output token throughput.  Without network access the
trace can also be synthesized (--dataset synthetic) with the same
length distributions used by the reference's sampler (input/output
lengths 4..2048)."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import queue
import random
import threading
import time

import numpy as np


def sample_requests(dataset_path: str, num_requests: int, tokenizer,
                    vocab_size: int):
    """[(input_ids, output_len)] — from a ShareGPT json or synthetic."""
    rng = random.Random(0)
    if dataset_path == 'synthetic':
        out = []
        for _ in range(num_requests):
            in_len = rng.randint(4, 512)
            out_len = rng.randint(4, 512)
            ids = [rng.randint(3, vocab_size - 1) for _ in range(in_len)]
            out.append((ids, out_len))
        return out
    with open(dataset_path) as f:
        data = json.load(f)
    convs = [d['conversations'] for d in data
             if len(d.get('conversations', [])) >= 2]
    pairs = [(c[0]['value'], c[1]['value']) for c in convs]
    rng.shuffle(pairs)
    out = []
    for prompt, completion in pairs:
        ids = tokenizer.encode(prompt)
        out_len = len(tokenizer.encode(completion))
        if not (4 <= len(ids) <= 1024 and 4 <= out_len <= 1024):
            continue
        out.append((ids, out_len))
        if len(out) >= num_requests:
            break
    return out


def main():
    ap = argparse.ArgumentParser('profile_throughput')
    ap.add_argument('model_path')
    ap.add_argument('--dataset', default='synthetic',
                    help='ShareGPT json path or "synthetic"')
    ap.add_argument('--num-prompts', type=int, default=64)
    ap.add_argument('--concurrency', type=int, default=16)
    ap.add_argument('--tp', type=int, default=1)
    args = ap.parse_args()

    from lmdeploy_tpu.api import build_engine
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.messages import GenerationConfig

    engine = build_engine(args.model_path,
                          engine_config=None if args.tp == 1
                          else EngineConfig(tp=args.tp))
    reqs = sample_requests(args.dataset, args.num_prompts, engine.tokenizer,
                           engine.cfg.vocab_size)
    work: queue.Queue = queue.Queue()
    for i, r in enumerate(reqs):
        work.put((i, r))
    done = []
    lock = threading.Lock()

    def worker():
        inst = engine.create_instance()
        while True:
            try:
                i, (ids, out_len) = work.get_nowait()
            except queue.Empty:
                return
            gen = GenerationConfig(max_new_tokens=out_len, top_k=1,
                                   ignore_eos=True)
            out = inst.infer(100 + i, ids, gen_config=gen,
                             sequence_end=True)
            with lock:
                done.append((len(ids), out.num_generated))

    threads = [threading.Thread(target=worker)
               for _ in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    in_toks = sum(i for i, _ in done)
    out_toks = sum(o for _, o in done)
    print(f'requests: {len(done)} in {elapsed:.1f}s '
          f'({len(done) / elapsed:.2f} req/s)')
    print(f'total token throughput: {(in_toks + out_toks) / elapsed:.1f} '
          f'tok/s')
    print(f'output token throughput: {out_toks / elapsed:.1f} tok/s')
    engine.shutdown()


if __name__ == '__main__':
    main()
