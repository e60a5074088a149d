"""Running-slot stall during a long-prompt admission, POST snap-fix
(interleave rounds snap to already-compiled lengths; the stale
interleave.json predates the fix it motivated).  4 slots stream
1-in/360-out greedy; a 512-token prompt admits in 128-token chunks;
gap = wall time between stream bursts of a running slot inside the
admission window.  Prints ONE JSON line."""
import gc
import json
import sys
import threading
import time

sys.path.insert(0, '/root/repo')


def run_arm(interleave):
    import jax

    import bench
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                      inter_size=11008, num_layer=32, vocab_size=32000,
                      rotary_embedding=128, max_position_embeddings=4096,
                      session_len=2048, weight_type='int4', group_size=128)
    ecfg = EngineConfig(max_batch_size=8, session_len=1024, page_size=64,
                        num_pages=80, max_context_token_num=128,
                        prefill_buckets=(128,), step_length=64,
                        speculative_k=0, prefill_interleave=interleave)
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    del params
    gc.collect()
    inst = eng.create_instance()
    # warm compiles: decode ramp + the 128 prefill bucket
    inst.infer(0, list(range(1, 200)), gen_config=GenerationConfig(
        max_new_tokens=90, top_k=1, ignore_eos=True), sequence_end=True)
    time.sleep(1.0)

    gaps = []
    lock = threading.Lock()
    admit_t0 = [None]
    admit_t1 = [None]
    ttft = [None]

    def streamer(i):
        gen = GenerationConfig(max_new_tokens=360, top_k=1,
                               ignore_eos=True)
        last = [None]
        for out in inst.stream_infer(10 + i, [1], gen, sequence_end=True):
            now = time.perf_counter()
            if last[0] is not None and admit_t0[0] is not None \
                    and (admit_t1[0] is None or last[0] < admit_t1[0]):
                with lock:
                    gaps.append(now - last[0])
            last[0] = now

    ts = [threading.Thread(target=streamer, args=(i,)) for i in range(4)]
    for t in ts:
        t.start()
    time.sleep(2.0)   # streams reach steady state

    def admitter():
        admit_t0[0] = time.perf_counter()
        gen = GenerationConfig(max_new_tokens=8, top_k=1, ignore_eos=True)
        for out in inst.stream_infer(99, list(range(1, 513)), gen,
                                     sequence_end=True):
            if ttft[0] is None and out.num_generated > 0:
                ttft[0] = time.perf_counter() - admit_t0[0]
        admit_t1[0] = time.perf_counter()

    ta = threading.Thread(target=admitter)
    ta.start()
    ta.join()
    for t in ts:
        t.join()
    eng.shutdown()
    del eng, inst
    gc.collect()
    g = sorted(gaps)

    def pct(p):
        return round(g[min(len(g) - 1, int(p * len(g)))] * 1e3, 1) \
            if g else None
    return {'interleave': interleave, 'gap_p50_ms': pct(0.5),
            'gap_p95_ms': pct(0.95),
            'gap_max_ms': round(g[-1] * 1e3, 1) if g else None,
            'long_prompt_ttft_ms': round(ttft[0] * 1e3, 1)
            if ttft[0] else None,
            'bursts_observed': len(g)}


def main():
    arms = [run_arm(0), run_arm(8)]
    print(json.dumps({
        'metric': 'running-slot stall during long-prompt admission '
                  '(post snap-fix, packed int4)',
        'arms': arms,
        'note': ('4 slots stream 1-in/360-out greedy while a 512-token '
                 'prompt admits in 128-token chunks; gap = wall time '
                 'between stream bursts of a running slot inside the '
                 'admission window')}), flush=True)


if __name__ == '__main__':
    main()
