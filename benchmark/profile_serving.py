"""HTTP serving profiler against a running api_server.

Reference: benchmark/profile_serving.py:168-176 — fires concurrent
clients at the server and reports req/s + token throughput + latency
stats."""
from __future__ import annotations

import os.path as _osp
import sys as _sys

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import argparse
import json
import random
import threading
import time
import urllib.request

import numpy as np


def one_request(url: str, session_id: int, prompt: str, out_len: int):
    payload = {
        'prompt': prompt, 'instance_id': session_id, 'stream': True,
        'request_output_len': out_len, 'ignore_eos': True,
        'sequence_start': True, 'sequence_end': True,
    }
    req = urllib.request.Request(
        f'{url}/generate', json.dumps(payload).encode(),
        {'Content-Type': 'application/json'})
    t0 = time.perf_counter()
    first = None
    tokens = 0
    with urllib.request.urlopen(req) as resp:
        for line in resp:
            if not line.strip():
                continue
            data = json.loads(line)
            if first is None and data['tokens']:
                first = time.perf_counter() - t0
            tokens = data['tokens']
    return time.perf_counter() - t0, first or 0.0, tokens


def main():
    ap = argparse.ArgumentParser('profile_serving')
    ap.add_argument('server', nargs='?', default='http://0.0.0.0:23333')
    ap.add_argument('--num-requests', type=int, default=32)
    ap.add_argument('--concurrency', type=int, default=8)
    ap.add_argument('--output-len', type=int, default=128)
    args = ap.parse_args()

    rng = random.Random(0)
    words = ['tell', 'me', 'about', 'the', 'model', 'story', 'explain']
    results = []
    lock = threading.Lock()
    ids = list(range(args.num_requests))

    def worker(worker_id):
        while True:
            with lock:
                if not ids:
                    return
                i = ids.pop()
            prompt = ' '.join(rng.choices(words, k=rng.randint(4, 32)))
            r = one_request(args.server, 1000 + i, prompt, args.output_len)
            with lock:
                results.append(r)

    threads = [threading.Thread(target=worker, args=(w,))
               for w in range(args.concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t0
    total_toks = sum(r[2] for r in results)
    ftl = [r[1] for r in results]
    print(f'{len(results)} requests in {elapsed:.1f}s '
          f'-> {len(results) / elapsed:.2f} req/s, '
          f'{total_toks / elapsed:.1f} completion tok/s')
    print(f'first-token latency: avg {np.mean(ftl) * 1e3:.0f}ms '
          f'p95 {np.percentile(ftl, 95) * 1e3:.0f}ms')


if __name__ == '__main__':
    main()
