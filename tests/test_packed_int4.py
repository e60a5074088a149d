"""Packed-nibble int4 matmul (ops/pallas/quant_matmul.py) vs the
byte-per-int4 oracle — the sub-byte residency path (reference analogue:
gemm_s_f16 in-register dequant GEMM, tests = numerics vs cublas fp16)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.ops.linear import (PackedInt4Weight, QuantizedWeight,
                                     dequantize, pack_quantized,
                                     quant_matmul, quant_matmul_packed,
                                     quantize_weight_int4)
from lmdeploy_tpu.ops.pallas.quant_matmul import (pack_nibbles,
                                                  packed_int4_matmul,
                                                  unpack_nibbles_jax)


def _mk(k=512, n=256, group=128, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(k, n)).astype(np.float32) * 0.1
    return quantize_weight_int4(w, group)


def test_pack_roundtrip():
    rng = np.random.default_rng(1)
    q = rng.integers(0, 16, size=(3, 8, 16), dtype=np.uint8)
    p = pack_nibbles(q)
    assert p.shape == (3, 4, 16)
    np.testing.assert_array_equal(np.asarray(unpack_nibbles_jax(p)), q)


@pytest.mark.parametrize('m', [1, 4, 40, 128])
def test_packed_matches_byte_oracle(m):
    qw = _mk()
    pw = pack_quantized(qw)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(m, qw.k)), jnp.bfloat16)
    ref = quant_matmul(x, qw)                       # byte-per-int4 oracle
    got = quant_matmul_packed(x, pw, jnp.int32(0), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=0.5)


def test_packed_exact_vs_dense_dequant():
    """f32 x makes the kernel's scale-term math near-exact vs a dense
    dequantized matmul (bf16 dot rounding only)."""
    qw = _mk(k=256, n=128)
    pw = pack_quantized(qw)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, qw.k)), jnp.float32)
    w = np.asarray(dequantize(qw, jnp.float32))
    ref = np.asarray(x, np.float32) @ w
    got = np.asarray(quant_matmul_packed(x, pw, jnp.int32(0),
                                         interpret=True))
    np.testing.assert_allclose(got, ref, rtol=0.02, atol=0.5)


def test_layer_prefetch_selects_layer():
    """Stacked [L] weights: the scalar-prefetch layer index must pick the
    right layer's tiles (the in-scan usage)."""
    qws = [_mk(seed=s) for s in (10, 11, 12)]
    stacked = QuantizedWeight(
        qvals=jnp.stack([q.qvals for q in qws]),
        scales=jnp.stack([q.scales for q in qws]),
        zeros=jnp.stack([q.zeros for q in qws]))
    pw = pack_quantized(stacked)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(2, qws[0].k)), jnp.bfloat16)
    for li, qw in enumerate(qws):
        ref = quant_matmul(x, qw)
        got = quant_matmul_packed(x, pw, jnp.int32(li), interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.5)


def test_large_m_xla_regime(monkeypatch):
    """M past _PACKED_PALLAS_MAX_M with the prefill kernel disabled
    rides the XLA unpack formulation — same numbers."""
    monkeypatch.setenv('LMDEPLOY_TPU_PACKED_PREFILL', '0')
    qw = _mk(k=256, n=128)
    pw = pack_quantized(qw)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(96, qw.k)), jnp.bfloat16)
    ref = quant_matmul(x, qw)
    got = quant_matmul_packed(x, pw, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=1.0)


@pytest.mark.parametrize('m', [96, 200, 513])
def test_large_m_prefill_kernel_regime(m):
    """The M-blocked kernel (default large-M path: one true-4-bit
    weight pass, M grid axis, padding rows) matches the XLA unpack
    formulation at prefill shapes, including a non-multiple-of-block
    M."""
    qw = _mk(k=256, n=128)
    pw = pack_quantized(qw)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(m, qw.k)), jnp.bfloat16)
    ref = quant_matmul(x, qw)
    got = quant_matmul_packed(x, pw, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0.05, atol=1.0)


def test_forward_parity_packed_vs_byte():
    """Full model forward: pack_params output must produce the same
    logits as the byte-per-int4 params (decode T=1 -> Pallas kernel
    regime; prefill T=9 -> XLA regime)."""
    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.kvcache.paged import init_cache
    from lmdeploy_tpu.models.llama import (StepBatch, forward, init_params,
                                           pack_params, quantize_params)
    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=32,
                      inter_size=256, num_layer=2, vocab_size=256,
                      rotary_embedding=32, max_position_embeddings=128,
                      session_len=128)
    params = init_params(cfg, jax.random.PRNGKey(0))
    qparams = quantize_params(params, cfg, group_size=32)
    pparams = pack_params(qparams)

    page_size, max_pages = 8, 4
    rng = np.random.default_rng(7)
    for t in (9, 1):
        ids = rng.integers(0, 256, size=(2, t))
        pt = np.arange(2 * max_pages, dtype=np.int32).reshape(2, max_pages)
        batch = StepBatch(
            ids=jnp.asarray(ids, jnp.int32),
            positions=jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32),
                                       (2, t)),
            valid=jnp.ones((2, t), bool),
            context_len=jnp.full((2,), t, jnp.int32),
            page_table=jnp.asarray(pt))
        cache = init_cache(cfg.num_layer, 2 * max_pages + 1, page_size,
                           cfg.kv_head_num, cfg.size_per_head, jnp.bfloat16)
        ref, _ = forward(qparams, cache, batch, cfg)
        got, _ = forward(pparams, cache, batch, cfg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0.05, atol=0.5)


def test_kernel_odd_m_padding():
    qw = _mk(k=256, n=128)
    pw = pack_quantized(qw)
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.normal(size=(5, qw.k)), jnp.bfloat16)
    got = packed_int4_matmul(x, pw.packed, pw.scales, jnp.int32(0),
                             interpret=True)
    assert got.shape == (5, qw.n)


def test_packed_with_fused_rope_decode_parity(monkeypatch):
    """The best-case production stack — packed int4 weights + the fused
    rope+append+attend kernel — must emit the same greedy tokens as the
    plain byte-int4 XLA path (the exact flag combination the on-chip A/B
    compiles; interpret-mode here so a numerics bug never burns chip
    time)."""
    import dataclasses

    from lmdeploy_tpu.config import ModelConfig
    from lmdeploy_tpu.engine.step import decode_step, init_decode_state
    from lmdeploy_tpu.kvcache.paged import init_cache
    from lmdeploy_tpu.models.llama import (init_params, pack_params,
                                           quantize_params)
    from lmdeploy_tpu.ops.pallas import paged_attention as pa

    for name in ('paged_decode_attention_write',
                 'paged_decode_attention_rope_write'):
        orig = getattr(pa, name)
        monkeypatch.setattr(
            pa, name,
            lambda *a, _o=orig, **kw: _o(*a, **{**kw, 'interpret': True}))

    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=128,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=128, max_position_embeddings=64,
                      session_len=64, end_id=2, weight_type='int4',
                      group_size=32)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    qparams = quantize_params(params, cfg, group_size=32)
    pparams = pack_params(qparams)

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
                       cfg.size_per_head, jnp.bfloat16)
    key = jax.random.PRNGKey(3)
    cache = dataclasses.replace(
        cache,
        k=jax.random.normal(key, cache.k.shape, jnp.bfloat16),
        v=jax.random.normal(key, cache.v.shape, jnp.bfloat16))

    _, _, tok_ref, _, lp_ref = decode_step(qparams, cache, state, cfg,
                                           use_pallas_attn=False)
    monkeypatch.setenv('LMDEPLOY_TPU_FUSED_ROPE', '1')
    _, _, tok, _, lp = decode_step(pparams, cache, state, cfg,
                                   use_pallas_attn=True)
    assert np.asarray(tok_ref).tolist() == np.asarray(tok).tolist()
    np.testing.assert_allclose(np.asarray(lp), np.asarray(lp_ref),
                               rtol=0.05, atol=0.05)


def test_tune_table_block_n_selection():
    """mm_tune.json winners steer the packed kernel's N tile; unknown
    shapes fall back to the default (gemm_config.in-equivalent plumbing,
    benchmark/autotune.py --packed)."""
    from lmdeploy_tpu.ops.linear import (_tuned_block_n, set_tune_table,
                                         tune_key)
    try:
        set_tune_table({tune_key(4096, 12288, 3): 256})
        # M=3 buckets to 4 -> same key
        assert tune_key(4096, 12288, 3) == '4096:12288:4'
        assert _tuned_block_n(3, 4096, 12288) == 256
        assert _tuned_block_n(4, 4096, 12288) == 256
        # different M bucket / shape -> None = kernel VMEM-budget auto
        # pick (full-N rows when they fit: measured 900 GB/s vs 88.7 at
        # the old static 256/512 tiles)
        assert _tuned_block_n(8, 4096, 12288) is None
        assert _tuned_block_n(3, 4096, 11008) is None
        from lmdeploy_tpu.ops.pallas.quant_matmul import _auto_block_n
        assert _auto_block_n(11008, 16) == 11008   # full rows fit
        assert _auto_block_n(12288, 16) == 12288
        assert _auto_block_n(32000, 16) == 6400    # lm_head: budget-capped
        assert _auto_block_n(32000, 64) == 6400
    finally:
        set_tune_table({})


def test_auto_block_n_m_grid_budget():
    """The M-blocked (prefill) regime's working set is ~3x the f32
    accumulator, not ~1.3x (VERDICT r4 weak #2: a deterministic 22.23M
    scoped-VMEM compile OOM at blocks [bm=256, bn=6144] on llama-7B wqkv
    [512, 12288], .r4/prefill_tput:kernel2.log).  Assert the budget
    model now rejects that exact known-OOM pick and that every llama-7B
    (M, N) prefill shape fits the 16M scoped limit under the EMPIRICAL
    cost 768*bn + 11.13*bm*bn measured from that log (22.23M / 6144 per
    lane column at bm=256)."""
    from lmdeploy_tpu.ops.pallas.quant_matmul import (_auto_block_n,
                                                      _choose_tiles)
    # the known-OOM shape: the M-grid pick must now be below 6144
    bn = _auto_block_n(12288, 256, m_grid=True)
    assert bn < 6144 and 12288 % bn == 0 and bn % 128 == 0
    # every llama-7B prefill (M, N): chosen tiles fit the 16M hardware
    # scoped limit under the measured cost model
    for n in (12288, 11008, 4096, 32000):
        for m in (512, 2048):
            bm, mp, bn = _choose_tiles(m, n, 256, None)
            assert n % bn == 0 and mp % bm == 0 and mp >= m
            measured_cost = bn * (768 + 11.13 * bm)
            assert measured_cost <= 16e6, (n, m, bm, bn, measured_cost)
    # n=11008's divisor ladder {128, 256, 5504, 11008}: the chooser must
    # halve bm to 128 to win the 5504 tile (bn=256 streams at 88.7 GB/s
    # vs 900 for big contiguous row tiles — .r4/kernel_tune3.log)
    bm, _, bn = _choose_tiles(512, 11008, 256, None)
    assert (bm, bn) == (128, 5504)
    # wqkv keeps bm=256 (12288's ladder is dense; bn=3072 fits)
    bm, _, bn = _choose_tiles(512, 12288, 256, None)
    assert (bm, bn) == (256, 3072)
    # decode/verify picks (chip-verified at 900 GB/s) are unchanged
    assert _auto_block_n(11008, 16) == 11008
    assert _choose_tiles(1, 11008, 256, None)[2] == 11008
    assert _auto_block_n(12288, 128) == 12288 // 2
