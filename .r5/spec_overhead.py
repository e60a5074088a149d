"""Spec-verify round cost attribution WITHOUT the profiler (the xplane
capture OOMs next to the engine on this chip — 3 failed attempts).

One cell per invocation (SPEC_CELL env), each printing ONE JSON line
with ms_per_round (spec cells) or ms_per_token (plain cells), measured
from the FIRST streamed token to finish (excludes TTFT + ramp start)
and normalized by the engine's own stats counters, so acceptance rate
does not bias the timing.

Cells (attribution algebra):
  plain        k=0 greedy        -> step ms/token (the 9.26 ms class)
  plain_samp   k=0 sampled       -> plain candidates-pipeline ms/token
  greedy_k4    k=4 argmax verify -> round cost, no sampling pipeline
  greedy_k1/k2                   -> verify-row slope
  sampled_k4   k=4 'candidates'  -> round cost incl. rejection pipeline
  nodraft_k4   k=4 greedy, ngram_propose patched to zero drafts
               -> round cost without draft building
  sampling cost   = sampled_k4 - greedy_k4
  ngram cost      = greedy_k4 - nodraft_k4
  5-row fwd extra = nodraft_k4 - plain
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

CELL = os.environ.get('SPEC_CELL', 'plain')


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    spec_k = {'greedy_k1': 1, 'greedy_k2': 2, 'greedy_k3': 3, 'greedy_k4': 4,
              'sampled_k4': 4, 'nodraft_k4': 4,
              'nokv_k1': 1, 'nokv_k4': 4,
              'greedy_k4_min0': 4, 'greedy_k4_dot': 4,
              'cand_k4': 4}.get(CELL, 0)
    if CELL == 'cand_k4':
        # greedy WORKLOAD on the 'candidates' verify pipeline (patch the
        # all-greedy mode pick): same acceptance/dispatch profile as
        # greedy_k4, different verify formulation — discriminates "raw
        # argmax derails the schedule" (the plain-path dead-end class)
        # from "ngram lookup costs 1.8ms".  Token stream stays identical
        # (top_k==1 candidates are a point mass on the argmax).
        import lmdeploy_tpu.engine.engine as eng_mod
        eng_mod._all_plain_greedy = lambda cfgs: False
    if CELL.startswith('nokv'):
        # diagnostic: is the verify-path KV pool scatter (B*T rows via
        # page-table indirection, 2 scatters x 32 layers per round) the
        # per-verify-row slope?  Skip the T>1 write (T==1 plain/fused
        # rounds unaffected; attention reads stale KV — WRONG TOKENS,
        # timing-only evidence: ms_per_round keeps its meaning).
        import lmdeploy_tpu.models.llama as _lm
        _real_write = _lm.write_kv

        def _skip_big_write(cache_k, cache_v, layer, k_new, v_new,
                            positions, page_table, valid, qparams=None):
            if k_new.shape[1] > 1:
                return cache_k, cache_v
            return _real_write(cache_k, cache_v, layer, k_new, v_new,
                               positions, page_table, valid, qparams)
        _lm.write_kv = _skip_big_write
    if CELL == 'nodraft_k4':
        # patch BEFORE the engine compiles: step.py resolves
        # ngram_propose at call time from the ops module
        import lmdeploy_tpu.ops.speculative as spec_ops

        def zero_draft(history, history_len, k, ngram, ngram_min=0):
            return jnp.zeros((history.shape[0], k), jnp.int32)
        spec_ops.ngram_propose = zero_draft

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=2048, weight_type='int4', group_size=128)
    ecfg = EngineConfig(max_batch_size=2, session_len=1024, page_size=64,
                        num_pages=24, max_context_token_num=512,
                        prefill_buckets=(64, 512), step_length=64,
                        speculative_k=spec_k,
                        # min0 cell: disable the shorter-suffix cascade
                        # (one match pass instead of two) to tell pass-
                        # count-proportional ngram cost from fixed cost
                        speculative_ngram_min=(
                            0 if CELL.endswith('_min0') else 2))
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    if spec_k > 0:
        # pin the adaptive acceptance gate OFF: low-acceptance cells
        # (nodraft / sampled on random weights) otherwise cool off to
        # PLAIN rounds mid-measurement and corrupt ms_per_round (the
        # first nodraft/sampled runs: 11 fallbacks, accept 4.68 "per
        # round" — plain-round tokens folded in)
        eng.SPEC_MIN_ACCEPT = -1.0
    del params
    import gc
    gc.collect()
    inst = eng.create_instance()

    if CELL in ('plain_samp', 'sampled_k4'):
        kw = dict(top_k=40, top_p=0.9, temperature=0.8, random_seed=7)
    else:
        kw = dict(top_k=1)

    # warm every ramp shape + compile
    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=140, ignore_eos=True, **kw), sequence_end=True)
    time.sleep(1.0)

    gen = GenerationConfig(max_new_tokens=600, ignore_eos=True, **kw)
    for attempt in range(3):
        t0 = r0 = g0 = None
        nt0 = 0
        for out in inst.stream_infer(10 + attempt, [1], gen_config=gen,
                                     sequence_end=True):
            if t0 is None and out.token_ids:
                t0 = time.perf_counter()
                r0 = eng.stats['spec_rounds']
                g0 = eng.stats['generated_tokens']
                nt0 = len(out.token_ids)
        t1 = time.perf_counter()
        if t0 is not None and len(out.token_ids) > nt0:
            break
        time.sleep(30.0)   # transient RESOURCE_EXHAUSTED window
    if t0 is None:
        print(json.dumps({'cell': CELL, 'error':
                          'no tokens streamed in 3 attempts '
                          '(backend RESOURCE_EXHAUSTED class)'}),
              flush=True)
        return
    r1 = eng.stats['spec_rounds']
    g1 = eng.stats['generated_tokens']
    ntok = len(out.token_ids) - nt0
    eng.shutdown()

    dt = t1 - t0
    res = {'cell': CELL, 'spec_k': spec_k, 'gen_s': round(dt, 3),
           'tokens': ntok, 'rounds': r1 - r0,
           'generated': g1 - g0,
           'spec_fallbacks': eng.stats['spec_fallbacks']}
    if spec_k > 0 and r1 > r0:
        res['ms_per_round'] = round(dt / (r1 - r0) * 1e3, 3)
        res['accept_per_round'] = round((g1 - g0) / (r1 - r0), 3)
    if ntok > 0:
        res['ms_per_token'] = round(dt / ntok * 1e3, 3)
        res['tok_s'] = round(ntok / dt, 1)
    print(json.dumps(res), flush=True)


if __name__ == '__main__':
    main()
