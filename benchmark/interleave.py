"""SARATHI chunked-prefill interleave A/B: running-slot stall while a
long prompt admits.

Scenario (VERDICT r2 item 9): 4 sessions stream decode; a 512-token
prompt is admitted mid-stream (4 chunk passes at a 128-token budget).
With ``prefill_interleave=0`` the running slots stall for the WHOLE
admission; with ``prefill_interleave=k`` the scheduler squeezes k decode
steps between chunk passes so streams keep moving (engine.py:726;
beyond-reference — the reference stalls decode for the full context
pass, LlamaBatch.cc contextDecode).

Reports per-arm: running-slot inter-burst gap p50/p95/max (ms) measured
across the admission window, plus the long prompt's TTFT.  One JSON
line.  Usage: python -m benchmark.interleave [--interleave 0,8]
"""
from __future__ import annotations

import argparse
import json
import os.path as _osp
import sys as _sys
import threading
import time

_sys.path.insert(0, _osp.dirname(_osp.dirname(_osp.abspath(__file__))))

import numpy as np


def run_arm(interleave: int, step_length: int = 16):
    import jax

    from bench import random_int4_params
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=1024, weight_type='int4', group_size=128)
    ecfg = EngineConfig(max_batch_size=8, session_len=1024, page_size=32,
                        num_pages=120, max_context_token_num=128,
                        prefill_buckets=(16, 128), step_length=step_length,
                        speculative_k=0, prefill_interleave=interleave)
    params = random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    inst = eng.create_instance()

    # warmup: both prefill buckets + decode ramp
    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=40, top_k=1, ignore_eos=True), sequence_end=True)
    inst.infer(1, list(range(3, 120)), gen_config=GenerationConfig(
        max_new_tokens=4, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(2.0)

    rng = np.random.default_rng(0)
    long_prompt = rng.integers(3, 32000, size=512).tolist()
    gen_run = GenerationConfig(max_new_tokens=360, top_k=1, ignore_eos=True)

    events = {i: [] for i in range(4)}      # (t, num_generated)
    admit_t = {}
    ttft = {}

    def runner(i):
        for out in inst.stream_infer(10 + i, [1], gen_run,
                                     sequence_end=True):
            events[i].append((time.perf_counter(), out.num_generated))

    def admitter():
        # wait until every runner is mid-stream, then admit the long one
        while not all(len(v) >= 2 for v in events.values()):
            time.sleep(0.01)
        admit_t['t'] = time.perf_counter()
        for out in inst.stream_infer(
                99, long_prompt,
                GenerationConfig(max_new_tokens=16, top_k=1,
                                 ignore_eos=True),
                sequence_end=True):
            if out.num_generated > 0 and 't' not in ttft:
                ttft['t'] = time.perf_counter() - admit_t['t']

    ts = [threading.Thread(target=runner, args=(i,)) for i in range(4)]
    ta = threading.Thread(target=admitter)
    for t in ts:
        t.start()
    ta.start()
    for t in ts + [ta]:
        t.join()
    eng.shutdown()

    # inter-burst gaps of running slots inside the admission window
    # (admit .. admit+prefill+2s), normalized per emitted token too
    t0 = admit_t['t']
    t1 = t0 + ttft.get('t', 2.0) + 1.0
    gaps, per_tok = [], []
    for i in range(4):
        ev = events[i]
        for (ta_, na), (tb_, nb) in zip(ev, ev[1:]):
            if t0 <= tb_ <= t1 and nb > na:
                gaps.append((tb_ - ta_) * 1e3)
                per_tok.append((tb_ - ta_) * 1e3 / (nb - na))
    gaps = np.asarray(sorted(gaps))
    return {
        'interleave': interleave,
        'gap_p50_ms': round(float(np.percentile(gaps, 50)), 1),
        'gap_p95_ms': round(float(np.percentile(gaps, 95)), 1),
        'gap_max_ms': round(float(gaps.max()), 1),
        'per_token_ms_p95': round(float(np.percentile(per_tok, 95)), 1),
        'long_prompt_ttft_ms': round(ttft.get('t', float('nan')) * 1e3, 1),
        'bursts_observed': int(len(gaps)),
    }


def main():
    ap = argparse.ArgumentParser('interleave')
    ap.add_argument('--interleave', default='0,8')
    ap.add_argument('--step-length', type=int, default=16)
    args = ap.parse_args()
    arms = [run_arm(int(k), args.step_length)
            for k in args.interleave.split(',')]
    print(json.dumps({
        'metric': 'running-slot stall during long-prompt admission',
        'arms': arms,
        'note': ('4 slots stream 1-in/360-out greedy while a 512-token '
                 'prompt admits in 128-token chunks; gap = wall time '
                 'between stream bursts of a running slot inside the '
                 'admission window'),
    }))


if __name__ == '__main__':
    main()
