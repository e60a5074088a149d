"""Saturation / throughput sweep on one chip: the reference's headline
serving regime (README.md "Performance": >2000 tok/s fp16 saturated,
+30% vs vLLM on ShareGPT; benchmark/profile_throughput.py:136-138
reports req/s + total tok/s).

Two phases against ONE engine sized for 64 decode slots:

1. **decode sweep** — bs in {8, 16, 32, 64} concurrent 1-in/128-out
   greedy sessions; aggregate output tok/s per point.  Finds the
   continuous-batching knee on the v5e (where weight streaming stops
   dominating and the MXU starts earning its keep).
2. **request stream** — a ShareGPT-shaped synthetic mix (input 4..384,
   output 16..192 tokens) replayed by 16 client threads; reports req/s
   and output/total tok/s like the reference's profiler.

Usage:  python -m benchmark.saturation [--skip-stream] [--bs 8,16,32,64]
Prints ONE JSON line (consumed by bench notes / README).

Sizing: page_size 32, 330 pages  ->  5.5 GB bf16 KV; int4 weights
~3.6 GB; fits the 16 GB chip with headroom (OOM observed ~13-16 GB).
"""
from __future__ import annotations

import argparse
import json
import os.path as _osp
import random
import sys as _sys
import threading
import time

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))


def build_engine(max_batch: int = 64):
    import jax

    from bench import random_int4_params
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=2048, weight_type='int4', group_size=128)
    ecfg = EngineConfig(max_batch_size=max_batch, session_len=512,
                        page_size=32, num_pages=330,
                        max_context_token_num=512,
                        prefill_buckets=(64, 512), step_length=64,
                        speculative_k=0)
    params = random_int4_params(cfg, jax.random.PRNGKey(0))
    return TPUEngine(cfg, ecfg, params), cfg


def decode_sweep(eng, batch_sizes, out_tokens: int = 128):
    """Aggregate decode tok/s at each concurrency (1-token prompts so
    prefill cost is negligible and the number isolates decode)."""
    from lmdeploy_tpu.messages import GenerationConfig
    inst = eng.create_instance()
    # compile warmup: prefill bucket + ramp rounds + full round
    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=90, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(2.0)

    results = {}
    sid = 100
    for bs in batch_sizes:
        gen = GenerationConfig(max_new_tokens=out_tokens, top_k=1,
                               ignore_eos=True)
        counts = [0] * bs

        def worker(i, s):
            for out in inst.stream_infer(s, [1], gen, sequence_end=True):
                counts[i] = out.num_generated

        ts = [threading.Thread(target=worker, args=(i, sid + i))
              for i in range(bs)]
        sid += bs
        t0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - t0
        total = sum(counts)
        results[bs] = round(total / dt, 1) if total else 0.0
        print(f'# bs={bs}: {total} tokens in {dt:.1f}s -> '
              f'{results[bs]} tok/s', flush=True)
        time.sleep(1.0)
    return results


def request_stream(eng, vocab_size: int, num_requests: int = 48,
                   concurrency: int = 16):
    """ShareGPT-shaped synthetic request replay -> req/s + tok/s."""
    import queue

    from lmdeploy_tpu.messages import GenerationConfig
    rng = random.Random(0)
    reqs = [([rng.randint(3, vocab_size - 1)
              for _ in range(rng.randint(4, 384))],
             rng.randint(16, 192))
            for _ in range(num_requests)]

    work: queue.Queue = queue.Queue()
    for i, r in enumerate(reqs):
        work.put((i, r))
    done = []
    lock = threading.Lock()

    def worker():
        inst = eng.create_instance()
        while True:
            try:
                i, (ids, out_len) = work.get_nowait()
            except queue.Empty:
                return
            gen = GenerationConfig(max_new_tokens=out_len, top_k=1,
                                   ignore_eos=True)
            out = inst.infer(1000 + i, ids, gen_config=gen,
                             sequence_end=True)
            with lock:
                done.append((len(ids), out.num_generated))

    threads = [threading.Thread(target=worker) for _ in range(concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    in_toks = sum(i for i, _ in done)
    out_toks = sum(o for _, o in done)
    return {
        'requests': len(done),
        'elapsed_s': round(elapsed, 1),
        'req_per_s': round(len(done) / elapsed, 2),
        'output_tok_s': round(out_toks / elapsed, 1),
        'total_tok_s': round((in_toks + out_toks) / elapsed, 1),
        'concurrency': concurrency,
    }


def main():
    ap = argparse.ArgumentParser('saturation')
    ap.add_argument('--bs', default='8,16,32,64')
    ap.add_argument('--out-tokens', type=int, default=128)
    ap.add_argument('--skip-stream', action='store_true')
    ap.add_argument('--skip-sweep', action='store_true')
    ap.add_argument('--requests', type=int, default=48)
    ap.add_argument('--concurrency', type=int, default=16)
    args = ap.parse_args()

    batch_sizes = [int(b) for b in args.bs.split(',') if b]
    eng, cfg = build_engine(max_batch=max(batch_sizes + [16]))
    try:
        sweep = ({} if args.skip_sweep else
                 decode_sweep(eng, batch_sizes, args.out_tokens))
        stream = (None if args.skip_stream else
                  request_stream(eng, cfg.vocab_size, args.requests,
                                 args.concurrency))
    finally:
        eng.shutdown()

    import jax
    print(json.dumps({
        'metric': 'llama2-7b w4a16 saturated decode tok/s',
        'decode_sweep_tok_s': sweep,
        'request_stream': stream,
        'device': str(jax.devices()[0]),
        'note': ('one engine sized for the largest bs; 1-token prompts '
                 'in the sweep isolate decode; the stream phase replays '
                 'a ShareGPT-shaped synthetic mix like the reference '
                 'profile_throughput.py (no network: no real ShareGPT '
                 'file in this environment)'),
    }))


if __name__ == '__main__':
    main()
