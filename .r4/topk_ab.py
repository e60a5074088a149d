"""A/B LMDEPLOY_TPU_APPROX_TOPK at bs1 and bs8 (VERDICT r3 weak #2: bs8
regressed 417 -> 364 after approx-topk defaulted on unmeasured).

Run once per flag value in a fresh subprocess (the flag is baked into the
traced program).  Prints ONE JSON line with repeated measurements.
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

REPEATS = 3


def main():
    approx = os.environ.get('LMDEPLOY_TPU_APPROX_TOPK', '1')
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
                        num_pages=88, max_context_token_num=512,
                        prefill_buckets=(64, 512), step_length=64,
                        speculative_k=0)
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    inst = eng.create_instance()

    gen = GenerationConfig(max_new_tokens=256, top_k=1, ignore_eos=True)
    # warm both program shapes
    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=90, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(1.0)

    bs1 = []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        out = inst.infer(100 + r, [1], gen_config=gen, sequence_end=True)
        dt = time.perf_counter() - t0
        if out.token_ids:
            bs1.append(len(out.token_ids) / dt)
        time.sleep(0.5)

    # bs8 continuous batching, same shape as bench.py
    import threading
    gen_b = GenerationConfig(max_new_tokens=128, top_k=1, ignore_eos=True)
    bs8 = []
    for r in range(REPEATS):
        counts = [0] * 8

        def worker(i, r=r):
            for out in inst.stream_infer(1000 + 10 * r + i, [1], gen_b,
                                         sequence_end=True):
                counts[i] = out.num_generated

        ts = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
        tb0 = time.perf_counter()
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        dt = time.perf_counter() - tb0
        if sum(counts):
            bs8.append(sum(counts) / dt)
        time.sleep(0.5)

    eng.shutdown()
    print(json.dumps({'approx_topk': approx,
                      'bs1_tok_s': [round(x, 1) for x in bs1],
                      'bs8_tok_s': [round(x, 1) for x in bs8]}),
          flush=True)


if __name__ == '__main__':
    main()
