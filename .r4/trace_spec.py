"""Capture an xplane trace of a speculative bs1 run (k=4, step_length=64)
and attribute the ~17.4 ms/tok step cost per op category (VERDICT r3
weak #1: ~40% of the step unexplained vs the ~10.6 ms weight-stream floor).

Prints ONE JSON line: trace summary + measured tok/s during the capture.
"""
import json
import shutil
import sys
import time

sys.path.insert(0, '/root/repo')

TRACE_DIR = '/root/repo/.r4/xplane_spec'


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
    # small footprint: the profiler's trace buffers + the engine must
    # co-reside; the bench-sized 88-page bf16 pool (5.9 GB) plus
    # profiling RESOURCE_EXHAUSTEDs the 16 GB chip
    ecfg = EngineConfig(max_batch_size=2, session_len=1024, page_size=64,
                        num_pages=24, max_context_token_num=512,
                        prefill_buckets=(64, 512), step_length=64,
                        speculative_k=4)
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    # the engine repacked the int4 layers to sub-byte residency; drop the
    # caller's reference so the 3.3 GB byte-per-int4 qvals free on device
    # (keeping them + packed + profiler buffers OOMs the 16 GB chip)
    import gc
    del params
    gc.collect()
    inst = eng.create_instance()
    gen = GenerationConfig(max_new_tokens=192, top_k=1, ignore_eos=True)

    # warm every ramp shape so the capture sees only steady-state k=64
    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=140, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(1.0)

    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    t0 = time.perf_counter()
    out = inst.infer(1, [1], gen_config=gen, sequence_end=True)
    dt = time.perf_counter() - t0
    jax.profiler.stop_trace()
    eng.shutdown()

    toks = len(out.token_ids) / dt if out.token_ids else 0.0
    from benchmark.trace_summary import summarize
    s = summarize(TRACE_DIR, top=30)
    print(json.dumps({'tok_s_during_capture': round(toks, 1),
                      'n_tokens': len(out.token_ids),
                      'wall_s': round(dt, 2),
                      'summary': s}), flush=True)


if __name__ == '__main__':
    main()
