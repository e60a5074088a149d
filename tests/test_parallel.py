"""Tensor-parallel parity: the shard_map SPMD program over a virtual
8-device CPU mesh must reproduce single-device numerics (the reference has
no such test — NCCL TP is only checkable on real GPUs; SURVEY.md §4 calls
out fake-backend mesh tests as the rebuild's advantage)."""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import EngineConfig, ModelConfig
from lmdeploy_tpu.engine.step import (CompiledStepFns, init_decode_state,
                                      install_slot)
from lmdeploy_tpu.kvcache.paged import init_cache
from lmdeploy_tpu.models.llama import init_params, quantize_params
from lmdeploy_tpu.ops.sampling import SamplingState
from lmdeploy_tpu.parallel.tp import (ShardedStepFns, cache_pspecs,
                                      make_mesh, param_pspecs,
                                      prepare_params_for_tp, replicate_tree,
                                      shard_tree)

CFG = ModelConfig(head_num=8, kv_head_num=4, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=128, session_len=64, end_id=2)

B, MAXP, PAGE, NPAGES = 2, 8, 8, 32


def build_state(params, fns, cache=None):
    state = init_decode_state(B, MAXP, CFG.session_len, eos_id=CFG.end_id)
    if cache is None:
        cache = init_cache(CFG.num_layer, NPAGES, PAGE, CFG.kv_head_num,
                           CFG.size_per_head, jnp.float32)
    prompt = [3, 17, 42, 99, 5]
    hist = np.zeros((CFG.session_len,), np.int32)
    hist[:len(prompt)] = prompt
    pages = np.full((MAXP,), -1, np.int32)
    pages[:4] = [0, 1, 2, 3]
    srow = SamplingState(
        top_k=jnp.int32(1), top_p=jnp.float32(1.0), min_p=jnp.float32(0.0),
        temperature=jnp.float32(1.0), repetition_penalty=jnp.float32(1.0),
        presence_penalty=jnp.float32(0.0),
        frequency_penalty=jnp.float32(0.0),
        rng_key=jax.random.key_data(jax.random.PRNGKey(0)).astype(jnp.uint32),
        bad_words=jnp.full((32,), -1, jnp.int32),
        stop_words=jnp.full((32,), -1, jnp.int32),
        eos_id=jnp.int32(CFG.end_id), ignore_eos=jnp.asarray(True),
        min_new_tokens=jnp.int32(0), max_new_tokens=jnp.int32(16))
    state = install_slot(state, 0, jnp.int32(prompt[-1]),
                         jnp.int32(len(prompt) - 1), jnp.asarray(hist),
                         jnp.int32(len(prompt)), jnp.asarray(pages), srow)
    # prefill the prompt minus the last token
    ids = np.zeros((8,), np.int32)
    ids[:len(prompt) - 1] = prompt[:-1]
    cache, _ = fns.prefill_chunk(params, cache, state, jnp.int32(0),
                                 jnp.asarray(ids), jnp.int32(0),
                                 jnp.int32(len(prompt) - 1))
    return cache, state


def run_steps(fns, params, cache, state, n=6):
    toks = []
    for _ in range(n):
        cache, state, tok, fin, _ = fns.decode_step(params, cache, state)
        toks.append(int(np.asarray(tok)[0]))
    return toks


@pytest.mark.parametrize('tp', [2, 4])
def test_tp_decode_matches_single_device(tp):
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)

    ref_fns = CompiledStepFns(CFG)
    cache, state = build_state(params, ref_fns)
    want = run_steps(ref_fns, params, cache, state)

    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(params, CFG, tp)
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    tp_fns = ShardedStepFns(CFG, mesh)
    cache2, state2 = build_state(params, ref_fns)
    cache2 = shard_tree(cache2, cache_pspecs(), mesh)
    state2 = replicate_tree(state2, mesh)
    got = run_steps(tp_fns, tparams, cache2, state2)
    assert got == want


def test_tp_prefill_logits_match(tp=4):
    params = init_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    cache = init_cache(CFG.num_layer, NPAGES, PAGE, CFG.kv_head_num,
                       CFG.size_per_head, jnp.float32)
    row = np.full((MAXP,), -1, np.int32)
    row[:2] = [0, 1]
    ids = np.asarray([5, 9, 113, 77, 3, 0, 0, 0], np.int32)

    ref = CompiledStepFns(CFG)
    _, want = ref.prefill_logits_row(params, cache, jnp.asarray(row),
                                     jnp.asarray(ids), jnp.int32(0),
                                     jnp.int32(5))
    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(params, CFG, tp)
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    fns = ShardedStepFns(CFG, mesh)
    cache2 = shard_tree(init_cache(CFG.num_layer, NPAGES, PAGE,
                                   CFG.kv_head_num, CFG.size_per_head,
                                   jnp.float32), cache_pspecs(), mesh)
    _, got = fns.prefill_logits_row(tparams, cache2, jnp.asarray(row),
                                    jnp.asarray(ids), jnp.int32(0),
                                    jnp.int32(5))
    v = CFG.vocab_size
    np.testing.assert_allclose(np.asarray(got)[:5, :v],
                               np.asarray(want)[:5, :v], rtol=2e-4, atol=2e-4)


def test_tp_kv_int4_per_head_scales(tp=2):
    """Nibble-packed INT4 KV with per-head [L, KH] qparams: the scale
    head dim shards with the KV heads (cache_pspecs per_head_scales), and
    decode matches the single-device engine token for token."""
    params = init_params(CFG, jax.random.PRNGKey(5), jnp.float32)
    rng = np.random.default_rng(9)
    scales = [rng.uniform(0.05, 0.15,
                          (CFG.num_layer, CFG.kv_head_num)).astype(np.float32),
              np.zeros((CFG.num_layer, CFG.kv_head_num), np.float32),
              rng.uniform(0.05, 0.15,
                          (CFG.num_layer, CFG.kv_head_num)).astype(np.float32),
              np.zeros((CFG.num_layer, CFG.kv_head_num), np.float32)]

    def build_int4(fns):
        pool = init_cache(CFG.num_layer, NPAGES, PAGE, CFG.kv_head_num,
                          CFG.size_per_head, jnp.uint8, kv_scales=scales)
        return build_state(params, fns, cache=pool)

    ref = CompiledStepFns(CFG)
    cache, state = build_int4(ref)
    want = run_steps(ref, params, cache, state)

    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(params, CFG, tp)
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    fns = ShardedStepFns(CFG, mesh, per_head_kv_scales=True)
    cache2, state2 = build_int4(ref)
    cache2 = shard_tree(cache2, cache_pspecs(per_head_scales=True), mesh)
    state2 = replicate_tree(state2, mesh)
    got = run_steps(fns, tparams, cache2, state2)
    assert got == want


def test_tp_int4_weights(tp=2):
    """W4A16 weights survive the TP repack: column-permuted qkv and
    rank-local nibble repack of row-parallel weights."""
    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    qparams = quantize_params(params, CFG, group_size=16)

    ref = CompiledStepFns(CFG)
    cache, state = build_state(qparams, ref)
    want = run_steps(ref, qparams, cache, state)

    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(qparams, CFG, tp)
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    fns = ShardedStepFns(CFG, mesh)
    cache2, state2 = build_state(qparams, ref)
    cache2 = shard_tree(cache2, cache_pspecs(), mesh)
    state2 = replicate_tree(state2, mesh)
    got = run_steps(fns, tparams, cache2, state2)
    assert got == want


def test_tp_int4_inter_padding(tp=2):
    """Row-parallel int4 w2 with inter_size NOT divisible by group*tp
    (llama-2-7B: 11008 / (128*4) = 21.5) must pad inter with exact-zero
    columns/rows instead of splitting quant groups across ranks."""
    cfg = dataclasses.replace(CFG, inter_size=80)  # 5 groups of 16, tp=2
    params = init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    qparams = quantize_params(params, cfg, group_size=16)

    ref = CompiledStepFns(cfg)
    cache, state = build_state(qparams, ref)
    want = run_steps(ref, qparams, cache, state)

    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(qparams, cfg, tp)
    assert tparams['layers']['w2'].k == 96  # padded to group*tp multiple
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    fns = ShardedStepFns(cfg, mesh)
    cache2, state2 = build_state(qparams, ref)
    cache2 = shard_tree(cache2, cache_pspecs(), mesh)
    state2 = replicate_tree(state2, mesh)
    got = run_steps(fns, tparams, cache2, state2)
    assert got == want


@pytest.mark.parametrize('dp,tp', [(2, 1), (2, 2)])
def test_engine_dp_end_to_end(dp, tp):
    """dp-group engine: per-group page pools/schedulers over the (dp, tp)
    mesh must stream identical tokens to the dp=1 engine, for concurrent
    sessions routed to different groups, incl. the prompt-logits path
    (pinned to group 0).  The reference cannot do this at all — its engine
    is single-node with node_id hard-coded 0 (turbomind.py:81-83)."""
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    params = init_params(CFG, jax.random.PRNGKey(7), jnp.float32)
    base = EngineConfig(max_batch_size=4, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=2, tp=1, dp=1)
    gen = GenerationConfig(max_new_tokens=5, top_k=1, ignore_eos=True)
    prompts = {1: [3, 17, 42, 99, 5], 2: [9, 11], 3: [120, 7, 30]}

    def run(ecfg):
        eng = TPUEngine(CFG, ecfg, params)
        try:
            inst = eng.create_instance()
            # drive all three concurrently so both dp groups fill
            gens = {sid: inst.stream_infer(sid, p, gen_config=gen,
                                           sequence_end=True)
                    for sid, p in prompts.items()}
            outs = {sid: [o for o in g][-1].token_ids
                    for sid, g in gens.items()}
            logits = inst.decode(prompts[1])
            return outs, logits
        finally:
            eng.shutdown()

    want, logits1 = run(base)
    got, logits2 = run(dataclasses.replace(base, dp=dp, tp=tp))
    assert got == want
    np.testing.assert_allclose(logits2, logits1, rtol=2e-4, atol=2e-4)


def test_engine_dp_group_stickiness():
    """A continued session must land back in the dp group that holds its
    pages, and the groups' pools stay independent."""
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    params = init_params(CFG, jax.random.PRNGKey(8), jnp.float32)
    ecfg = EngineConfig(max_batch_size=4, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=2, tp=1, dp=2)
    gen = GenerationConfig(max_new_tokens=3, top_k=1, ignore_eos=True)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        out1 = inst.infer(1, [3, 17, 42], gen_config=gen)
        g1 = eng.seqs.group_of(1)
        out2 = inst.infer(2, [9, 11, 13], gen_config=gen)
        assert eng.seqs.group_of(2) != g1  # balancer spreads groups
        # interactive continuation reuses the same group's cache
        out1b = inst.infer(1, out1.token_ids[-1:] and [5],
                           gen_config=gen, sequence_start=False)
        assert eng.seqs.group_of(1) == g1
        assert len(out1b.token_ids) == 3
        assert len(out2.token_ids) == 3
    finally:
        eng.shutdown()


def test_engine_tp_end_to_end():
    """Full engine with tp=2 mesh produces identical streams to tp=1."""
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    params = init_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    ecfg1 = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                         num_pages=32, max_context_token_num=16,
                         prefill_buckets=(8, 16), use_pallas=False, tp=1)
    ecfg2 = dataclasses.replace(ecfg1, tp=2)
    gen = GenerationConfig(max_new_tokens=6, top_k=1, ignore_eos=True)

    def run(ecfg):
        eng = TPUEngine(CFG, ecfg, params)
        try:
            inst = eng.create_instance()
            out = inst.infer(1, [3, 17, 42, 99, 5], gen_config=gen,
                             sequence_end=True)
            logits = inst.decode([3, 17, 42])
            return out.token_ids, logits
        finally:
            eng.shutdown()

    toks1, logits1 = run(ecfg1)
    toks2, logits2 = run(ecfg2)
    assert toks1 == toks2
    np.testing.assert_allclose(logits1, logits2, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize('tp', [2, 4])
def test_tp_packed_int4_weights(tp):
    """TRUE sub-byte (nibble-packed) weights under TP: pack_params_for_tp
    repacks row-parallel weights per rank so each contiguous shard is a
    correctly half-split packed block — tokens must match the
    byte-per-int4 single-device oracle exactly."""
    from lmdeploy_tpu.parallel.tp import pack_params_for_tp
    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    qparams = quantize_params(params, CFG, group_size=16)

    ref = CompiledStepFns(CFG)
    cache, state = build_state(qparams, ref)
    want = run_steps(ref, qparams, cache, state)

    mesh = make_mesh(tp)
    tparams = prepare_params_for_tp(qparams, CFG, tp)
    tparams = pack_params_for_tp(tparams, tp)
    from lmdeploy_tpu.ops.linear import PackedInt4Weight
    assert isinstance(tparams['layers']['w2'], PackedInt4Weight)
    tparams = shard_tree(tparams, param_pspecs(tparams), mesh)
    fns = ShardedStepFns(CFG, mesh)
    cache2, state2 = build_state(qparams, ref)
    cache2 = shard_tree(cache2, cache_pspecs(), mesh)
    state2 = replicate_tree(state2, mesh)
    got = run_steps(fns, tparams, cache2, state2)
    assert got == want


def test_engine_packed_int4_tp(monkeypatch):
    """TPUEngine(tp=2) with LMDEPLOY_TPU_PACKED_INT4=1 repacks to true
    sub-byte residency per rank and serves token-identically to the
    byte-per-int4 tp engine."""
    from lmdeploy_tpu.config import EngineConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig
    from lmdeploy_tpu.ops.linear import PackedInt4Weight
    import lmdeploy_tpu.ops.pallas as pallas_ops

    cfg = dataclasses.replace(CFG, weight_type='int4', group_size=16)
    params = init_params(cfg, jax.random.PRNGKey(2), jnp.float32)
    qparams = quantize_params(params, cfg, group_size=16)
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=True,
                        step_length=4, tp=2)

    def run(packed: bool):
        if packed:
            monkeypatch.setenv('LMDEPLOY_TPU_PACKED_INT4', '1')
            monkeypatch.setattr(pallas_ops, 'PAGED_ATTENTION_AVAILABLE',
                                True)  # CPU runs the kernel in interpret
        else:
            monkeypatch.setenv('LMDEPLOY_TPU_PACKED_INT4', '0')
        eng = TPUEngine(cfg, ecfg, qparams)
        try:
            if packed:
                assert isinstance(eng.params['layers']['w2'],
                                  PackedInt4Weight)
            inst = eng.create_instance()
            return inst.infer(1, [3, 9, 4],
                              gen_config=GenerationConfig(
                                  max_new_tokens=4, top_k=1,
                                  ignore_eos=True),
                              sequence_end=True).token_ids
        finally:
            eng.shutdown()

    assert run(packed=True) == run(packed=False)


def test_top_logprobs_on_dp_tp_mesh():
    """The top-N readback planes ([5+2N, k, B] packed, batch LAST) must
    shard over dp like the base planes and match the single-device
    engine's alternatives."""
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig

    params = init_params(CFG, jax.random.PRNGKey(7), jnp.float32)
    base = EngineConfig(max_batch_size=4, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=2, tp=1, dp=1)
    gen = GenerationConfig(max_new_tokens=5, top_k=1, ignore_eos=True,
                           top_logprobs=3)

    def run(ecfg):
        eng = TPUEngine(CFG, ecfg, params)
        try:
            inst = eng.create_instance()
            outs = {}
            for sid, p in {1: [3, 17, 42], 2: [9, 11]}.items():
                outs[sid] = inst.infer(sid, p, gen_config=gen,
                                       sequence_end=True)
            return outs
        finally:
            eng.shutdown()

    want = run(base)
    got = run(dataclasses.replace(base, dp=2, tp=2))
    for sid in want:
        assert got[sid].token_ids == want[sid].token_ids
        assert len(got[sid].top_logprobs) == 5
        for a, b in zip(got[sid].top_logprobs, want[sid].top_logprobs):
            assert set(a) == set(b)
            for t in a:
                assert abs(a[t] - b[t]) < 1e-3
