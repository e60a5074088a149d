"""Prefill throughput at the 512 bucket — measures the dequant-regime
win (LMDEPLOY_TPU_DEQUANT_MIN_M=32 sends M>=32 prefill GEMMs to the
dequant-once formulation; VERDICT r3 item 2 asks for prefill tok/s
materially above ~3100).  Run once per env setting.  Prints ONE JSON
line."""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

REPEATS = 3


def main():
    import jax
    import bench
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=2048, weight_type='int4', group_size=128)
    ecfg = EngineConfig(max_batch_size=8, session_len=2048, page_size=64,
                        num_pages=88, max_context_token_num=1024,
                        prefill_buckets=(512,), step_length=8,
                        speculative_k=0)
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    import gc
    del params
    gc.collect()
    inst = eng.create_instance()
    prompt = list(range(5, 5 + 500))
    gen = GenerationConfig(max_new_tokens=1, top_k=1, ignore_eos=True)
    # warm the 512 bucket
    inst.infer(0, prompt, gen_config=gen, sequence_end=True)
    time.sleep(1.0)
    ttfts = []
    fails = 0
    for r in range(REPEATS):
        t0 = time.perf_counter()
        out = inst.infer(10 + r, prompt, gen_config=gen, sequence_end=True)
        if out.token_ids:             # an instantly-failed request must
            ttfts.append(time.perf_counter() - t0)   # not count as fast
        else:
            fails += 1
        time.sleep(0.5)
    eng.shutdown()
    if not ttfts:
        print(json.dumps({'error': 'all repeats failed', 'fails': fails}),
              flush=True)
        return
    best = min(ttfts)
    print(json.dumps({
        'fails': fails,
        'dequant_min_m': os.environ.get('LMDEPLOY_TPU_DEQUANT_MIN_M',
                                        '(default 32)'),
        'packed_prefill': os.environ.get('LMDEPLOY_TPU_PACKED_PREFILL',
                                         '(default 1)'),
        'prompt_tokens': len(prompt),
        'prefill_wall_s': [round(x, 3) for x in ttfts],
        'prefill_tok_s': round(len(prompt) / best, 1)}), flush=True)


if __name__ == '__main__':
    main()
