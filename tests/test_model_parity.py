"""Logit parity vs HuggingFace transformers on tiny random models —
the rebuild's version of the reference's decode()/PPL oracle
(turbomind.py:364, tests/pytorch/test_decode.py)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.convert.hf import config_from_hf, convert_hf_llama
from lmdeploy_tpu.kvcache.paged import init_cache
from lmdeploy_tpu.models.llama import StepBatch, forward

torch = pytest.importorskip('torch')


def tiny_hf_llama(attn_bias=False, kv_heads=2):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=kv_heads, vocab_size=128,
        max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=attn_bias, tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    return cfg, model


def make_batch(ids_np, max_pages, page_size):
    b, t = ids_np.shape
    pt = np.arange(b * max_pages, dtype=np.int32).reshape(b, max_pages)
    return StepBatch(
        ids=jnp.asarray(ids_np, jnp.int32),
        positions=jnp.broadcast_to(jnp.arange(t, dtype=jnp.int32), (b, t)),
        valid=jnp.ones((b, t), bool),
        context_len=jnp.full((b,), t, jnp.int32),
        page_table=jnp.asarray(pt),
    )


@pytest.mark.parametrize('kv_heads', [2, 4])
def test_prefill_logits_match_hf(kv_heads):
    hf_cfg, model = tiny_hf_llama(kv_heads=kv_heads)
    cfg = config_from_hf(hf_cfg.to_dict(), 'llama')
    params = convert_hf_llama(model.state_dict(), cfg, np.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()

    page_size = 8
    max_pages = 4
    cache = init_cache(cfg.num_layer, 2 * max_pages + 1, page_size,
                       cfg.kv_head_num, cfg.size_per_head, jnp.float32)
    batch = make_batch(ids, max_pages, page_size)
    logits, _ = forward(params, cache, batch, cfg, return_all_logits=True)
    got = np.asarray(logits, np.float32)[:, :, :cfg.vocab_size]
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-3)


def test_chunked_prefill_then_decode_matches_full_forward():
    """Prefill in 2 chunks + 3 decode steps == one full HF forward."""
    hf_cfg, model = tiny_hf_llama()
    cfg = config_from_hf(hf_cfg.to_dict(), 'llama')
    params = convert_hf_llama(model.state_dict(), cfg, np.float32)

    rng = np.random.default_rng(1)
    total = 11
    ids = rng.integers(0, 128, size=(1, total))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()

    page_size = 4
    max_pages = 6
    cache = init_cache(cfg.num_layer, max_pages + 1, page_size,
                       cfg.kv_head_num, cfg.size_per_head, jnp.float32)
    pt = jnp.arange(max_pages, dtype=jnp.int32)[None]

    def step(cache, ids_chunk, start):
        t = ids_chunk.shape[1]
        batch = StepBatch(
            ids=jnp.asarray(ids_chunk, jnp.int32),
            positions=start + jnp.arange(t, dtype=jnp.int32)[None],
            valid=jnp.ones((1, t), bool),
            context_len=jnp.array([start + t], jnp.int32),
            page_table=pt,
        )
        return forward(params, cache, batch, cfg)

    # chunked prefill: [0:5), [5:8)
    logits, cache = step(cache, ids[:, 0:5], 0)
    np.testing.assert_allclose(np.asarray(logits)[0, :128], want[0, 4],
                               rtol=2e-3, atol=5e-3)
    logits, cache = step(cache, ids[:, 5:8], 5)
    np.testing.assert_allclose(np.asarray(logits)[0, :128], want[0, 7],
                               rtol=2e-3, atol=5e-3)
    # decode steps for positions 8..10
    for pos in range(8, total):
        logits, cache = step(cache, ids[:, pos:pos + 1], pos)
        np.testing.assert_allclose(np.asarray(logits)[0, :128], want[0, pos],
                                   rtol=2e-3, atol=5e-3)


def test_prefill_with_padding_and_scattered_pages():
    """Right-padded batch rows and shuffled page tables give same logits."""
    hf_cfg, model = tiny_hf_llama()
    cfg = config_from_hf(hf_cfg.to_dict(), 'llama')
    params = convert_hf_llama(model.state_dict(), cfg, np.float32)

    rng = np.random.default_rng(2)
    len0, len1, tpad = 7, 5, 8
    ids = rng.integers(0, 128, size=(2, tpad))
    page_size = 4
    max_pages = 2
    # scattered, non-contiguous physical pages
    pt = np.array([[5, 1], [3, 0]], np.int32)
    cache = init_cache(cfg.num_layer, 7, page_size, cfg.kv_head_num,
                       cfg.size_per_head, jnp.float32)
    valid = np.zeros((2, tpad), bool)
    valid[0, :len0] = True
    valid[1, :len1] = True
    batch = StepBatch(
        ids=jnp.asarray(ids, jnp.int32),
        positions=jnp.broadcast_to(jnp.arange(tpad, dtype=jnp.int32), (2, tpad)),
        valid=jnp.asarray(valid),
        context_len=jnp.asarray([len0, len1], jnp.int32),
        page_table=jnp.asarray(pt),
    )
    logits, _ = forward(params, cache, batch, cfg)
    got = np.asarray(logits, np.float32)[:, :cfg.vocab_size]

    for row, ln in [(0, len0), (1, len1)]:
        with torch.no_grad():
            want = model(torch.from_numpy(ids[row:row + 1, :ln])).logits.numpy()
        np.testing.assert_allclose(got[row], want[0, -1], rtol=2e-3, atol=5e-3)


def test_int8_kv_cache_close_to_fp():
    hf_cfg, model = tiny_hf_llama()
    cfg = config_from_hf(hf_cfg.to_dict(), 'llama')
    params = convert_hf_llama(model.state_dict(), cfg, np.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, size=(1, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()[0, -1]

    page_size, max_pages = 8, 2
    scales = [np.full(cfg.num_layer, 0.05), np.zeros(cfg.num_layer),
              np.full(cfg.num_layer, 0.05), np.zeros(cfg.num_layer)]
    cache = init_cache(cfg.num_layer, max_pages + 1, page_size,
                       cfg.kv_head_num, cfg.size_per_head, jnp.int8,
                       kv_scales=scales)
    batch = make_batch(ids, max_pages, page_size)
    logits, _ = forward(params, cache, batch, cfg)
    got = np.asarray(logits)[0, :cfg.vocab_size]
    # int8 KV: correlation should survive even if absolute error grows.
    cos = got @ want / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.99


def test_int4_kv_cache_close_to_fp():
    """Nibble-packed INT4 KV (beyond-reference quant_policy=8): the pool
    stores two q-domain int4 per byte along Dh; logits must stay
    correlated with the fp oracle (coarser than int8, same harness)."""
    hf_cfg, model = tiny_hf_llama()
    cfg = config_from_hf(hf_cfg.to_dict(), 'llama')
    params = convert_hf_llama(model.state_dict(), cfg, np.float32)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, size=(1, 9))
    with torch.no_grad():
        want = model(torch.from_numpy(ids)).logits.numpy()[0, -1]

    page_size, max_pages = 8, 2
    scales = [np.full(cfg.num_layer, 0.1), np.zeros(cfg.num_layer),
              np.full(cfg.num_layer, 0.1), np.zeros(cfg.num_layer)]
    cache = init_cache(cfg.num_layer, max_pages + 1, page_size,
                       cfg.kv_head_num, cfg.size_per_head, jnp.uint8,
                       kv_scales=scales)
    assert cache.quant_bits == 4
    assert cache.k.shape[-1] == cfg.size_per_head // 2
    batch = make_batch(ids, max_pages, page_size)
    logits, _ = forward(params, cache, batch, cfg)
    got = np.asarray(logits)[0, :cfg.vocab_size]
    cos = got @ want / (np.linalg.norm(got) * np.linalg.norm(want))
    assert cos > 0.97
