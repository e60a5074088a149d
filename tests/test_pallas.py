"""Pallas kernel golden tests (interpret mode on CPU) — the reference's
kernel-vs-naive pattern (tests/csrc/unittests/test_attention_kernels.cu)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.kvcache.paged import gather_kv_layer, quantize_kv
from lmdeploy_tpu.ops.attention import gqa_attention
from lmdeploy_tpu.ops.pallas.paged_attention import paged_decode_attention


def build_case(rng, B, KH, G, DH, PAGE, MAXP, P, L=3, dtype=jnp.float32):
    k_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, KH, DH)), dtype)
    v_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, KH, DH)), dtype)
    pt = np.full((B, MAXP), -1, np.int32)
    ctx = rng.integers(1, MAXP * PAGE, size=B).astype(np.int32)
    for i in range(B):
        need = -(-int(ctx[i]) // PAGE)
        pt[i, :need] = rng.choice(P, size=need, replace=False)
    q = jnp.asarray(rng.normal(size=(B, KH * G, DH)), dtype)
    return q, k_cache, v_cache, jnp.asarray(pt), jnp.asarray(ctx)


@pytest.mark.parametrize('kh,g', [(8, 1), (4, 2)])
def test_paged_decode_attention_matches_gather(kh, g):
    rng = np.random.default_rng(0)
    B, DH, PAGE, MAXP, P, L = 3, 64, 16, 6, 32, 3
    q, kc, vc, pt, ctx = build_case(rng, B, kh, g, DH, PAGE, MAXP, P, L)
    layer = 1
    got = paged_decode_attention(q, kc, vc, jnp.int32(layer), pt, ctx,
                                 jnp.ones((4,), jnp.float32),
                                 quantized=False, interpret=True)
    kk, vv = gather_kv_layer(kc[layer], vc[layer], pt, None,
                             dtype=jnp.float32)
    want = gqa_attention(q[:, None], kk, vv, (ctx - 1)[:, None], ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_paged_decode_attention_int8_kv():
    rng = np.random.default_rng(1)
    B, KH, G, DH, PAGE, MAXP, P, L = 2, 4, 2, 64, 16, 4, 16, 2
    q, kc_f, vc_f, pt, ctx = build_case(rng, B, KH, G, DH, PAGE, MAXP, P, L)
    ks, kz, vs, vz = 0.05, 1.0, 0.04, -2.0
    kc = quantize_kv(kc_f, ks, kz)
    vc = quantize_kv(vc_f, vs, vz)
    layer = 0
    got = paged_decode_attention(
        q, kc, vc, jnp.int32(layer), pt, ctx,
        jnp.asarray([ks, kz, vs, vz], jnp.float32),
        quantized=True, interpret=True)
    kk, vv = gather_kv_layer(kc[layer], vc[layer], pt, (ks, kz, vs, vz),
                             dtype=jnp.float32)
    want = gqa_attention(q[:, None], kk, vv, (ctx - 1)[:, None], ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_forward_pallas_matches_gather_interpret(monkeypatch):
    """Full decode step with the Pallas path (interpret) == gather path."""
    import dataclasses
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.engine.step import decode_step, init_decode_state
    from lmdeploy_tpu.kvcache.paged import init_cache
    from lmdeploy_tpu.models.llama import init_params
    from lmdeploy_tpu.ops.pallas import paged_attention as pa

    orig = pa.paged_decode_attention
    monkeypatch.setattr(
        pa, 'paged_decode_attention',
        lambda *a, **kw: orig(*a, **{**kw, 'interpret': True}))

    cfg = ModelConfig(head_num=4, kv_head_num=2, size_per_head=16,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=16, max_position_embeddings=128,
                      session_len=64, end_id=2)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, MAXP, PAGE, NP = 2, 4, 8, 16
    state = init_decode_state(B, MAXP, 64, eos_id=2)
    pt = np.full((B, MAXP), -1, np.int32)
    pt[0, :2] = [3, 7]
    pt[1, :1] = [1]
    hist = np.zeros((B, 64), np.int32)
    state = dataclasses.replace(
        state, tokens=jnp.asarray([5, 9], jnp.int32),
        context_len=jnp.asarray([9, 3], jnp.int32),
        history_len=jnp.asarray([10, 4], jnp.int32),
        active=jnp.ones((B,), bool), page_table=jnp.asarray(pt),
        history=jnp.asarray(hist),
        sampling=dataclasses.replace(state.sampling,
                                     top_k=jnp.ones((B,), jnp.int32)))
    cache = init_cache(cfg.num_layer, NP, PAGE, cfg.kv_head_num,
                       cfg.size_per_head, jnp.float32)
    # seed cache with random prior KV so attention has real history
    key = jax.random.PRNGKey(3)
    cache = dataclasses.replace(
        cache, k=jax.random.normal(key, cache.k.shape, jnp.float32),
        v=jax.random.normal(key, cache.v.shape, jnp.float32))

    _, _, tok_ref, _, lp_ref = decode_step(params, cache, state, cfg,
                                           use_pallas_attn=False)
    _, _, tok_pal, _, lp_pal = decode_step(params, cache, state, cfg,
                                           use_pallas_attn=True)
    assert np.asarray(tok_ref).tolist() == np.asarray(tok_pal).tolist()
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_pal),
                               rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize('kh,g,start', [(2, 1, 0), (2, 2, 37)])
def test_paged_prefill_attention_matches_gather(kh, g, start):
    """Chunked prefill attention over pages == gather reference, incl.
    history offset (mismatched Q/K lengths, the FA2-fork capability)."""
    from lmdeploy_tpu.ops.pallas.prefill_attention import \
        paged_prefill_attention

    rng = np.random.default_rng(2)
    DH, PAGE, MAXP, P, L, T = 128, 64, 8, 24, 2, 256
    h = kh * g
    length = 200  # valid tokens in the chunk (rest padding)
    ctx_end = start + length
    k_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    pt = np.full((MAXP,), -1, np.int32)
    need = -(-ctx_end // PAGE)
    pt[:need] = rng.choice(P, size=need, replace=False)
    q = jnp.asarray(rng.normal(size=(T, h, DH)), jnp.float32)
    layer = 1

    got = paged_prefill_attention(
        q, k_cache, v_cache, jnp.int32(layer), jnp.asarray(pt),
        jnp.int32(start), jnp.int32(ctx_end),
        jnp.ones((4,), jnp.float32), quantized=False, interpret=True)

    kk, vv = gather_kv_layer(k_cache[layer], v_cache[layer],
                             jnp.asarray(pt)[None], None, dtype=jnp.float32)
    q_pos = (start + np.arange(T)).astype(np.int32)
    want = gqa_attention(q[None], kk, vv, jnp.asarray(q_pos)[None],
                         jnp.asarray([ctx_end]))[0]
    np.testing.assert_allclose(np.asarray(got)[:length],
                               np.asarray(want)[:length],
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize('quantized', [False, True])
def test_fused_write_attend_matches_scatter_plus_attend(quantized):
    """The fused append+attend kernel == XLA scatter write followed by
    the plain decode kernel (the reference mmha's in-kernel store+attend,
    decoder_masked_multihead_attention_template.cuh:1434)."""
    import dataclasses as dc

    from lmdeploy_tpu.kvcache.paged import init_cache, write_kv
    from lmdeploy_tpu.ops.pallas.paged_attention import (
        paged_decode_attention, paged_decode_attention_write)

    rng = np.random.default_rng(11)
    DH, PAGE, MAXP, P, L, B = 128, 16, 4, 12, 2, 3
    kh, g = 2, 2
    dtype = jnp.int8 if quantized else jnp.float32
    cache = init_cache(L, P, PAGE, kh, DH, dtype,
                       kv_scales=([0.05, 0.04], [1.0, -2.0],
                                  [0.06, 0.05], [0.0, 3.0])
                       if quantized else None)
    seed = rng.integers(-100, 100, size=cache.k.shape)
    cache = dc.replace(cache,
                       k=jnp.asarray(seed, dtype),
                       v=jnp.asarray(rng.integers(-100, 100,
                                                  cache.v.shape), dtype))
    layer = 1
    ctx = np.asarray([9, 17, 1], np.int32)    # current token INCLUDED
    pt = np.full((B, MAXP), -1, np.int32)
    for i in range(B):
        need = -(-int(ctx[i]) // PAGE)
        pt[i, :need] = rng.choice(P, size=need, replace=False)
    q = jnp.asarray(rng.normal(size=(B, kh * g, DH)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, kh, DH)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, kh, DH)), jnp.float32)
    qp = np.stack([np.asarray(x)[layer] for x in
                   (cache.k_scale, cache.k_zp, cache.v_scale,
                    cache.v_zp)])
    qparams = tuple(jnp.asarray(x) for x in qp) if quantized else None

    # oracle: XLA scatter write, then the plain kernel
    ck, cv = write_kv(cache.k, cache.v, layer, k_new[:, None],
                      v_new[:, None], (ctx - 1)[:, None],
                      jnp.asarray(pt), jnp.ones((B, 1), bool), qparams)
    want = paged_decode_attention(q, ck, cv, jnp.int32(layer),
                                  jnp.asarray(pt), jnp.asarray(ctx),
                                  jnp.asarray(qp, jnp.float32),
                                  quantized=quantized, interpret=True)

    gk, gv, got = paged_decode_attention_write(
        q, k_new, v_new, jnp.array(cache.k), jnp.array(cache.v),
        jnp.int32(layer),
        jnp.asarray(pt), jnp.asarray(ctx), jnp.ones((B,), jnp.int32),
        jnp.asarray(qp, jnp.float32), quantized=quantized, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(cv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    # masked slot must leave the pool untouched
    mk, mv, _ = paged_decode_attention_write(
        q, k_new, v_new, jnp.array(cache.k), jnp.array(cache.v),
        jnp.int32(layer),
        jnp.asarray(pt), jnp.asarray(ctx), jnp.zeros((B,), jnp.int32),
        jnp.asarray(qp, jnp.float32), quantized=quantized, interpret=True)
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(cache.k))
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(cache.v))


def test_paged_prefill_attention_batched_multi_slot():
    """Multi-slot prefill kernel (grid over (slot, q-block)) matches the
    gather reference per slot, with per-slot history offsets and a
    zero-length padding row (reference: batched chunked context decode
    across admissions, LlamaBatch.cc:795-858)."""
    from lmdeploy_tpu.ops.pallas.prefill_attention import \
        paged_prefill_attention_batched

    rng = np.random.default_rng(5)
    DH, PAGE, MAXP, P, L, T = 128, 64, 8, 32, 2, 128
    kh, g = 2, 2
    h = kh * g
    B = 3
    starts = np.asarray([0, 37, 0], np.int32)
    lengths = np.asarray([100, 91, 0], np.int32)   # row 2 = padding row
    ends = starts + lengths
    k_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    pts = np.full((B, MAXP), -1, np.int32)
    used = rng.choice(P, size=MAXP * 2, replace=False)
    for i in range(B):
        need = max(-(-int(ends[i]) // PAGE), 1)
        pts[i, :need] = used[i * MAXP:i * MAXP + need][:need] \
            if i < 2 else used[-need:]
    q = jnp.asarray(rng.normal(size=(B, T, h, DH)), jnp.float32)
    layer = 1

    got = paged_prefill_attention_batched(
        q, k_cache, v_cache, jnp.int32(layer), jnp.asarray(pts),
        jnp.asarray(starts), jnp.asarray(ends),
        jnp.ones((4,), jnp.float32), quantized=False, interpret=True)

    for i in range(2):
        kk, vv = gather_kv_layer(k_cache[layer], v_cache[layer],
                                 jnp.asarray(pts[i])[None], None,
                                 dtype=jnp.float32)
        q_pos = (starts[i] + np.arange(T)).astype(np.int32)
        want = gqa_attention(q[i][None], kk, vv, jnp.asarray(q_pos)[None],
                             jnp.asarray([ends[i]]))[0]
        n = int(lengths[i])
        np.testing.assert_allclose(np.asarray(got)[i, :n],
                                   np.asarray(want)[:n],
                                   rtol=2e-3, atol=2e-3, err_msg=f'row {i}')


def test_verify_q_block_default_small(monkeypatch):
    """The speculative-verify q block defaults to the smallest 8-sublane
    cover (measured 15.64 -> 10.82 ms/round on chip, .r5/spec_overhead);
    '0' or '128' restores the classic prefill block, numeric values pick
    an explicit sublane multiple."""
    from lmdeploy_tpu.ops.pallas.prefill_attention import (Q_BLOCK,
                                                           verify_q_block)

    monkeypatch.delenv('LMDEPLOY_TPU_VERIFY_QBLOCK', raising=False)
    assert verify_q_block(5) == 8          # kp1=5 -> one 8-row sublane
    assert verify_q_block(2) == 8
    assert verify_q_block(9) == 16
    assert verify_q_block(Q_BLOCK) == Q_BLOCK
    assert verify_q_block(300) == Q_BLOCK  # long chunks keep the classic
    monkeypatch.setenv('LMDEPLOY_TPU_VERIFY_QBLOCK', '0')
    assert verify_q_block(5) == Q_BLOCK    # opt-out
    monkeypatch.setenv('LMDEPLOY_TPU_VERIFY_QBLOCK', '128')
    assert verify_q_block(5) == Q_BLOCK
    monkeypatch.setenv('LMDEPLOY_TPU_VERIFY_QBLOCK', '16')
    assert verify_q_block(5) == 16
    assert verify_q_block(17) == 32


def test_paged_prefill_attention_verify_qblock8():
    """The 8-sublane q-block (speculative-verify chunks, t = k_draft + 1
    padded to 8 instead of 128) matches the gather reference — the
    attention math must be q_block-invariant."""
    from lmdeploy_tpu.ops.pallas.prefill_attention import \
        paged_prefill_attention_batched

    rng = np.random.default_rng(9)
    DH, PAGE, MAXP, P, L, T = 128, 64, 8, 32, 2, 8
    kh, g = 2, 2
    h = kh * g
    B = 2
    kp1 = 5                                     # k_draft=4 verify rows
    starts = np.asarray([199, 63], np.int32)    # mid-session histories
    ends = starts + kp1
    k_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    v_cache = jnp.asarray(rng.normal(size=(L, P, PAGE, kh, DH)), jnp.float32)
    pts = np.full((B, MAXP), -1, np.int32)
    used = rng.choice(P, size=MAXP * 2, replace=False)
    for i in range(B):
        need = max(-(-int(ends[i]) // PAGE), 1)
        pts[i, :need] = used[i * MAXP:i * MAXP + need]
    q = jnp.asarray(rng.normal(size=(B, T, h, DH)), jnp.float32)
    layer = 1

    got = paged_prefill_attention_batched(
        q, k_cache, v_cache, jnp.int32(layer), jnp.asarray(pts),
        jnp.asarray(starts), jnp.asarray(ends),
        jnp.ones((4,), jnp.float32), quantized=False, interpret=True,
        q_block=8)

    for i in range(B):
        kk, vv = gather_kv_layer(k_cache[layer], v_cache[layer],
                                 jnp.asarray(pts[i])[None], None,
                                 dtype=jnp.float32)
        q_pos = (starts[i] + np.arange(T)).astype(np.int32)
        want = gqa_attention(q[i][None], kk, vv, jnp.asarray(q_pos)[None],
                             jnp.asarray([ends[i]]))[0]
        np.testing.assert_allclose(np.asarray(got)[i, :kp1],
                                   np.asarray(want)[:kp1],
                                   rtol=2e-3, atol=2e-3, err_msg=f'row {i}')


@pytest.mark.parametrize('quantized,rotary', [(False, 128), (True, 128),
                                              (False, 64)])
def test_fused_rope_write_attend_matches_unfused(quantized, rotary):
    """The fully fused rope+append+attend kernel == rope applied outside
    followed by the fused write kernel (mmha parity: rope at cuh:1381,
    store at cuh:1434, attend — all one kernel).  Covers INT8 pools,
    partial rotary dims and the logn q-scale."""
    import dataclasses as dc

    from lmdeploy_tpu.kvcache.paged import init_cache
    from lmdeploy_tpu.ops.pallas.paged_attention import (
        paged_decode_attention_rope_write, paged_decode_attention_write,
        rope_full_tables)
    from lmdeploy_tpu.ops.rope import apply_rope, rope_cos_sin

    rng = np.random.default_rng(13)
    DH, PAGE, MAXP, P, L, B = 128, 16, 4, 12, 2, 3
    kh, g = 2, 2
    half = rotary // 2
    dtype = jnp.int8 if quantized else jnp.float32
    cache = init_cache(L, P, PAGE, kh, DH, dtype,
                       kv_scales=([0.05, 0.04], [1.0, -2.0],
                                  [0.06, 0.05], [0.0, 3.0])
                       if quantized else None)
    cache = dc.replace(
        cache,
        k=jnp.asarray(rng.integers(-100, 100, cache.k.shape), dtype),
        v=jnp.asarray(rng.integers(-100, 100, cache.v.shape), dtype))
    layer = 1
    ctx = np.asarray([9, 17, 1], np.int32)
    pt = np.full((B, MAXP), -1, np.int32)
    for i in range(B):
        need = -(-int(ctx[i]) // PAGE)
        pt[i, :need] = rng.choice(P, size=need, replace=False)
    q = jnp.asarray(rng.normal(size=(B, kh * g, DH)), jnp.float32)
    k_new = jnp.asarray(rng.normal(size=(B, kh, DH)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, kh, DH)), jnp.float32)
    qp = np.stack([np.asarray(x)[layer] for x in
                   (cache.k_scale, cache.k_zp, cache.v_scale,
                    cache.v_zp)])
    qscale = jnp.asarray([1.0, 1.25, 0.8], jnp.float32)   # logn-style

    pos = jnp.asarray(ctx - 1, jnp.int32)
    cos, sin = rope_cos_sin(pos, rotary, 10000.0)          # [B, half]

    # oracle: rope outside (+ q scale), then the fused-write kernel
    q_rot = apply_rope(q[:, None], cos[:, None], sin[:, None])[:, 0]
    q_rot = q_rot * qscale[:, None, None]
    k_rot = apply_rope(k_new[:, None], cos[:, None], sin[:, None])[:, 0]
    wk, wv, want = paged_decode_attention_write(
        q_rot, k_rot, v_new, jnp.array(cache.k), jnp.array(cache.v),
        jnp.int32(layer), jnp.asarray(pt), jnp.asarray(ctx),
        jnp.ones((B,), jnp.int32), jnp.asarray(qp, jnp.float32),
        quantized=quantized, interpret=True)

    cos_f, sin_f = rope_full_tables(cos, sin, DH)
    gk, gv, got = paged_decode_attention_rope_write(
        q, k_new, v_new, cos_f, sin_f, qscale,
        jnp.array(cache.k), jnp.array(cache.v), jnp.int32(layer),
        jnp.asarray(pt), jnp.asarray(ctx), jnp.ones((B,), jnp.int32),
        jnp.asarray(qp, jnp.float32), half=half, quantized=quantized,
        interpret=True)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(wk),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gv), np.asarray(wv),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)

    # masked slots must not write
    mk, mv, _ = paged_decode_attention_rope_write(
        q, k_new, v_new, cos_f, sin_f, qscale,
        jnp.array(cache.k), jnp.array(cache.v), jnp.int32(layer),
        jnp.asarray(pt), jnp.asarray(ctx), jnp.zeros((B,), jnp.int32),
        jnp.asarray(qp, jnp.float32), half=half, quantized=quantized,
        interpret=True)
    np.testing.assert_array_equal(np.asarray(mk), np.asarray(cache.k))
    np.testing.assert_array_equal(np.asarray(mv), np.asarray(cache.v))


def test_fused_rope_forward_token_parity(monkeypatch):
    """Whole-model decode with LMDEPLOY_TPU_FUSED_ROPE=1 emits the same
    tokens/logits as the unfused gather path (logn + NTK on so the
    qscale and table plumbing is exercised; dh=128 so the Pallas gate
    passes)."""
    import dataclasses

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.engine.step import decode_step, init_decode_state
    from lmdeploy_tpu.kvcache.paged import init_cache
    from lmdeploy_tpu.models.llama import init_params
    from lmdeploy_tpu.ops.pallas import paged_attention as pa

    for name in ('paged_decode_attention_write',
                 'paged_decode_attention_rope_write'):
        orig = getattr(pa, name)
        monkeypatch.setattr(
            pa, name,
            lambda *a, _o=orig, **kw: _o(*a, **{**kw, 'interpret': True}))

    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=128,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=128, max_position_embeddings=8,
                      session_len=64, end_id=2, use_dynamic_ntk=True,
                      use_logn_attn=True)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    B, MAXP, PAGE, NP = 2, 4, 8, 16
    state = init_decode_state(B, MAXP, 64, eos_id=2)
    pt = np.full((B, MAXP), -1, np.int32)
    pt[0, :2] = [3, 7]
    pt[1, :1] = [1]
    state = dataclasses.replace(
        state, tokens=jnp.asarray([5, 9], jnp.int32),
        context_len=jnp.asarray([9, 3], jnp.int32),
        history_len=jnp.asarray([10, 4], jnp.int32),
        active=jnp.ones((B,), bool), page_table=jnp.asarray(pt),
        history=jnp.asarray(np.zeros((B, 64), np.int32)),
        sampling=dataclasses.replace(state.sampling,
                                     top_k=jnp.ones((B,), jnp.int32)))
    cache = init_cache(cfg.num_layer, NP, PAGE, cfg.kv_head_num,
                       cfg.size_per_head, jnp.float32)
    key = jax.random.PRNGKey(3)
    cache = dataclasses.replace(
        cache, k=jax.random.normal(key, cache.k.shape, jnp.float32),
        v=jax.random.normal(key, cache.v.shape, jnp.float32))

    _, _, tok_ref, _, lp_ref = decode_step(params, cache, state, cfg,
                                           use_pallas_attn=False)
    monkeypatch.setenv('LMDEPLOY_TPU_FUSED_ROPE', '1')
    _, _, tok_fr, _, lp_fr = decode_step(params, cache, state, cfg,
                                         use_pallas_attn=True)
    assert np.asarray(tok_ref).tolist() == np.asarray(tok_fr).tolist()
    np.testing.assert_allclose(np.asarray(lp_ref), np.asarray(lp_fr),
                               rtol=1e-3, atol=1e-3)


def _int4_case(rng, B, KH, G, DH, PAGE, MAXP, P, L):
    """Nibble-packed pool (uint8, last dim DH/2) + scalar qparams."""
    from lmdeploy_tpu.kvcache.paged import init_cache
    import dataclasses as dc
    cache = init_cache(L, P, PAGE, KH, DH, jnp.uint8,
                       kv_scales=([0.21] * L, [0.5] * L,
                                  [0.19] * L, [-0.5] * L))
    cache = dc.replace(
        cache,
        k=jnp.asarray(rng.integers(0, 256, cache.k.shape), jnp.uint8),
        v=jnp.asarray(rng.integers(0, 256, cache.v.shape), jnp.uint8))
    pt = np.full((B, MAXP), -1, np.int32)
    ctx = rng.integers(1, MAXP * PAGE, size=B).astype(np.int32)
    for i in range(B):
        need = -(-int(ctx[i]) // PAGE)
        pt[i, :need] = rng.choice(P, size=need, replace=False)
    q = jnp.asarray(rng.normal(size=(B, KH * G, DH)), jnp.float32)
    return cache, q, jnp.asarray(pt), jnp.asarray(ctx)


def test_paged_decode_attention_int4_kv():
    """In-kernel half-split nibble unpack == XLA gather+dequant path."""
    rng = np.random.default_rng(5)
    B, KH, G, DH, PAGE, MAXP, P, L = 2, 4, 2, 64, 16, 4, 16, 2
    cache, q, pt, ctx = _int4_case(rng, B, KH, G, DH, PAGE, MAXP, P, L)
    layer = 1
    qp = np.stack([np.asarray(x)[layer] for x in
                   (cache.k_scale, cache.k_zp, cache.v_scale, cache.v_zp)])
    got = paged_decode_attention(
        q, cache.k, cache.v, jnp.int32(layer), pt, ctx,
        jnp.asarray(qp, jnp.float32), quantized=True, interpret=True)
    kk, vv = gather_kv_layer(cache.k[layer], cache.v[layer], pt,
                             tuple(qp), dtype=jnp.float32)
    want = gqa_attention(q[:, None], kk, vv, (ctx - 1)[:, None], ctx)[:, 0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_fused_write_attend_int4_kv():
    """Fused append+attend on the nibble-packed pool: identical packed
    bytes to the XLA write path and matching attention output."""
    from lmdeploy_tpu.kvcache.paged import write_kv
    from lmdeploy_tpu.ops.pallas.paged_attention import \
        paged_decode_attention_write

    rng = np.random.default_rng(6)
    B, KH, G, DH, PAGE, MAXP, P, L = 3, 2, 2, 64, 16, 4, 12, 2
    cache, q, _, _ = _int4_case(rng, B, KH, G, DH, PAGE, MAXP, P, L)
    layer = 0
    k_new = jnp.asarray(rng.normal(size=(B, KH, DH)), jnp.float32)
    v_new = jnp.asarray(rng.normal(size=(B, KH, DH)), jnp.float32)
    qp = np.stack([np.asarray(x)[layer] for x in
                   (cache.k_scale, cache.k_zp, cache.v_scale, cache.v_zp)])
    # page tables must cover ctx (engine invariant: a slot's pages are
    # mapped before its tokens exist)
    ctx_np = np.asarray([9, 17, 1], np.int32)
    pt = np.full((B, MAXP), -1, np.int32)
    pool_pages = iter(rng.permutation(P))    # globally disjoint pages
    for i in range(B):
        need = -(-int(ctx_np[i]) // PAGE)
        pt[i, :need] = [next(pool_pages) for _ in range(need)]
    pt = jnp.asarray(pt)
    ctx = jnp.asarray(ctx_np)

    ck, cv = write_kv(cache.k, cache.v, layer, k_new[:, None],
                      v_new[:, None], (np.asarray(ctx) - 1)[:, None],
                      pt, jnp.ones((B, 1), bool), tuple(qp))
    want = paged_decode_attention(q, ck, cv, jnp.int32(layer), pt, ctx,
                                  jnp.asarray(qp, jnp.float32),
                                  quantized=True, interpret=True)
    gk, gv, got = paged_decode_attention_write(
        q, k_new, v_new, jnp.array(cache.k), jnp.array(cache.v),
        jnp.int32(layer), pt, ctx, jnp.ones((B,), jnp.int32),
        jnp.asarray(qp, jnp.float32), quantized=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(cv))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_paged_prefill_attention_int4_kv():
    """Prefill kernel unpacks the nibble pool == XLA gather oracle."""
    from lmdeploy_tpu.ops.pallas.prefill_attention import (
        Q_BLOCK, paged_prefill_attention)

    rng = np.random.default_rng(7)
    KH, G, DH, PAGE, P, L = 2, 2, 64, 64, 8, 2
    MAXP = 4
    cache, _, _, _ = _int4_case(rng, 1, KH, G, DH, PAGE, MAXP, P, L)
    layer = 1
    qp = np.stack([np.asarray(x)[layer] for x in
                   (cache.k_scale, cache.k_zp, cache.v_scale, cache.v_zp)])
    T, hist = Q_BLOCK, 37
    pt = np.asarray([2, 5, 1, 3], np.int32)
    q = jnp.asarray(rng.normal(size=(T, KH * G, DH)), jnp.float32)
    ctx_end = hist + T

    got = paged_prefill_attention(
        q, cache.k, cache.v, jnp.int32(layer), jnp.asarray(pt),
        jnp.int32(hist), jnp.int32(ctx_end),
        jnp.asarray(qp, jnp.float32), quantized=True, interpret=True)
    kk, vv = gather_kv_layer(cache.k[layer], cache.v[layer],
                             jnp.asarray(pt)[None], tuple(qp),
                             dtype=jnp.float32)
    pos = hist + np.arange(T)
    want = gqa_attention(q[None], kk, vv, jnp.asarray(pos)[None],
                         jnp.asarray([ctx_end]))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)
