"""Measure bs1 plain decode + TTFT under the current env-flag setting.
Used by cascade.sh for the risky A/Bs (LMDEPLOY_TPU_PACKED_INT4,
LMDEPLOY_TPU_FUSED_ROPE) — compile-hang-class programs, so each run is
its own process and the cascade treats a hang as a verdict.

Prints ONE JSON line: flags + repeated bs1 tok/s + ttft.
"""
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

    flags = {k: os.environ.get(k, '') for k in
             ('LMDEPLOY_TPU_PACKED_INT4', 'LMDEPLOY_TPU_FUSED_ROPE',
              'LMDEPLOY_TPU_DEQUANT_MIN_M', 'LMDEPLOY_TPU_APPROX_TOPK')}
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

    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=140, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(1.0)

    bs1, ttft = [], []
    for r in range(REPEATS):
        t0 = time.perf_counter()
        t_first, n = None, 0
        for out in inst.stream_infer(100 + r, [1], gen, sequence_end=True):
            if t_first is None and out.num_generated > 0:
                t_first = time.perf_counter()
            n = out.num_generated
        dt = time.perf_counter() - t0
        if n:
            bs1.append(n / dt)
            ttft.append((t_first - t0) * 1e3)
        time.sleep(0.5)
    eng.shutdown()
    print(json.dumps({'flags': flags,
                      'bs1_tok_s': [round(x, 1) for x in bs1],
                      'ttft_ms': [round(x, 1) for x in ttft]}), flush=True)


if __name__ == '__main__':
    main()
