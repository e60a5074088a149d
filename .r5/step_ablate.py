"""Plain-decode step cost attribution WITHOUT the profiler (xplane + 7B
engine never co-reside on this chip).  Engine-level flag-ablation cells,
one per invocation (STEP_CELL env), each printing ONE JSON line with
ms_per_token measured from first streamed token to finish.

Cells:
  full       unmodified plain greedy decode (the 8.6-9.3 ms/tok class)
  nolmhead   lm_head patched to zeros -> vocab-matmul + logits cost
             (tokens become constant argmax-0: timing-only evidence)
  noattn     decode attention kernels patched to passthrough (skips the
             page walk AND the fused KV write) -> attention+KV cost
             (garbage tokens: timing-only evidence)
  attribution:
    lm_head cost    = full - nolmhead
    attention cost  = full - noattn
    residual (weights + scan overhead) = nolmhead + noattn - full
"""
import json
import os
import sys
import time

sys.path.insert(0, '/root/repo')

CELL = os.environ.get('STEP_CELL', 'full')


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    if CELL == 'nolmhead':
        import lmdeploy_tpu.models.llama as lm
        _real = lm.lm_head_logits

        def zero_head(params, h_out, batch, cfg, *, return_all_logits=False,
                      logits_count=None, axis=None):
            b = h_out.shape[0]
            vp = params.get('lm_head',
                            params['tok_embedding'].T).shape[-1]
            if return_all_logits:
                t = (logits_count if logits_count is not None
                     else h_out.shape[1])
                return jnp.zeros((b, t, vp), jnp.float32)
            return jnp.zeros((b, vp), jnp.float32)
        lm.lm_head_logits = zero_head
    elif CELL == 'noattn':
        # the decode path resolves the kernels via local
        # `from ..ops.pallas.paged_attention import ...` at TRACE time,
        # so patching the kernels module before the engine compiles works
        import lmdeploy_tpu.ops.pallas.paged_attention as pa

        def rope_write(q, k_new, v_new, cos_f, sin_f, qscale, k_cache,
                       v_cache, layer, page_table, context_len, valid,
                       qparams4, *, half, quantized, interpret=False):
            return k_cache, v_cache, q
        pa.paged_decode_attention_rope_write = rope_write

        def write(q, k_new, v_new, k_cache, v_cache, layer, page_table,
                  context_len, valid, qparams4, *, quantized,
                  interpret=False):
            return k_cache, v_cache, q
        pa.paged_decode_attention_write = write

        def pda(q, k_cache, v_cache, layer, page_table, context_len,
                qparams4, *, quantized, interpret=False):
            return q
        pa.paged_decode_attention = pda

    if os.environ.get('LMDEPLOY_TPU_ABLATE_TINY') == '1':
        # CPU smoke of the patch plumbing (a wrong kernel signature must
        # not burn a serialized chip slot)
        cfg = ModelConfig(head_num=4, kv_head_num=2, size_per_head=16,
                          inter_size=64, num_layer=2, vocab_size=128,
                          rotary_embedding=16, max_position_embeddings=256,
                          session_len=256, weight_type='int4',
                          group_size=16)
        ecfg = EngineConfig(max_batch_size=2, session_len=128, page_size=16,
                            num_pages=24, max_context_token_num=64,
                            prefill_buckets=(16,), step_length=8,
                            speculative_k=0)
    else:
        cfg = ModelConfig(head_num=32, kv_head_num=32, size_per_head=128,
                          inter_size=11008, num_layer=32, vocab_size=32000,
                          rotary_embedding=128,
                          max_position_embeddings=4096,
                          session_len=2048, weight_type='int4',
                          group_size=128)
        ecfg = EngineConfig(max_batch_size=2, session_len=1024,
                            page_size=64, num_pages=24,
                            max_context_token_num=512,
                            prefill_buckets=(64, 512), step_length=64,
                            speculative_k=0)
    params = bench.random_int4_params(cfg, jax.random.PRNGKey(0))
    eng = TPUEngine(cfg, ecfg, params)
    del params
    import gc
    gc.collect()
    inst = eng.create_instance()
    kw = dict(top_k=1)

    inst.infer(0, [1], gen_config=GenerationConfig(
        max_new_tokens=140, ignore_eos=True, **kw), sequence_end=True)
    time.sleep(1.0)

    gen = GenerationConfig(max_new_tokens=600, ignore_eos=True, **kw)
    for attempt in range(3):
        t0 = None
        nt0 = 0
        out = None
        for out in inst.stream_infer(10 + attempt, [1], gen_config=gen,
                                     sequence_end=True):
            if t0 is None and out.token_ids:
                t0 = time.perf_counter()
                nt0 = len(out.token_ids)
        t1 = time.perf_counter()
        if t0 is not None and out is not None \
                and len(out.token_ids) > nt0:
            break
        time.sleep(30.0)
    if t0 is None or out is None or len(out.token_ids) <= nt0:
        print(json.dumps({'cell': CELL, 'error':
                          'no tokens streamed in 3 attempts'}), flush=True)
        return
    ntok = len(out.token_ids) - nt0
    eng.shutdown()
    dt = t1 - t0
    print(json.dumps({'cell': CELL, 'gen_s': round(dt, 3), 'tokens': ntok,
                      'ms_per_token': round(dt / ntok * 1e3, 3),
                      'tok_s': round(ntok / dt, 1)}), flush=True)


if __name__ == '__main__':
    main()
