"""Cross-session prefix caching tests (beyond-reference capability;
vLLM-style automatic prefix caching — the reference only reuses KV
within one interactive session).

Invariants under test (kvcache/manager.py module docstring):
- hits are exact (chain digest is a lookup key; spans verified),
- only full pages strictly before the final token are shared,
- shared pages are immutable while referenced (rewind privatizes),
- refcounting: erase/eviction never frees a page another owner holds,
- index pages are reclaimed last, after live-session eviction,
- engine output streams are IDENTICAL with caching on and off.
"""
import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import EngineConfig, ModelConfig
from lmdeploy_tpu.engine.engine import TPUEngine
from lmdeploy_tpu.messages import GenerationConfig
from lmdeploy_tpu.models.llama import init_params


def _managers():
    from lmdeploy_tpu.kvcache.manager import PageAllocator, SequenceManager
    yield 'python', lambda n, ps: SequenceManager(PageAllocator(n), ps)
    from lmdeploy_tpu.kvcache.native import NativeSequenceManager, load
    if load() is not None:
        yield 'native', lambda n, ps: NativeSequenceManager(n, ps)


@pytest.mark.parametrize('name,make', list(_managers()))
def test_manager_publish_match_refcount(name, make):
    m = make(8, 4)
    toks = list(range(100, 113))                  # 13 tokens, 3 full pages
    a = m.create(1)
    a.token_ids = toks
    m.grow(a, 13)
    a.cache_len = 13
    pages_a = list(a.pages)
    assert m.free_count == 4
    m.release(a)
    m.publish(a)
    assert m.free_count == 4                      # publish copies nothing

    # exact page-aligned hit, capped strictly before the last token
    b = m.create(2)
    hit = m.match_prefix(b, toks)                 # 13 ids -> 3 pages max
    assert hit == 12 and b.cache_len == 12
    assert list(b.pages) == pages_a[:3]           # physically shared
    assert m.prefix_hits >= 3

    # the cap: exactly 12 ids allows only (12-1)//4 = 2 pages
    c = m.create(3)
    assert m.match_prefix(c, toks[:12]) == 8

    # exactness: same page-1 span, different page-0 -> no hit at all
    d = m.create(4)
    other = [1, 2, 3, 4] + toks[4:13]
    assert m.match_prefix(d, other) == 0

    # refcounting: erasing the publisher frees only its private tail page
    m.erase(1)
    assert m.free_count == 5                      # 3 shared pages survive
    m.erase(2)
    m.erase(3)
    m.erase(4)
    assert m.free_count == 5

    # a new prefix-less allocation under pressure reclaims index pages
    e = m.create(5)
    m.grow(e, 32)                                 # needs all 8 pages
    assert len(e.pages) == 8 and m.free_count == 0


@pytest.mark.parametrize('name,make', list(_managers()))
def test_manager_prepare_rewrite_privatizes(name, make):
    m = make(10, 4)
    toks = list(range(50, 63))
    a = m.create(1)
    a.token_ids = toks
    m.grow(a, 13)
    a.cache_len = 13
    m.release(a)
    m.publish(a)

    b = m.create(2)
    assert m.match_prefix(b, toks) == 12
    shared = list(b.pages)
    # rewind into the middle of shared page 1: pages 1,2 privatized and
    # the cache drops to the page boundary
    eff = m.prepare_rewrite(b, 6)
    assert eff == 4
    assert b.pages[0] == shared[0]
    assert b.pages[1] != shared[1] and b.pages[2] != shared[2]
    # the original copies stay published and intact for other sessions
    c = m.create(3)
    assert m.match_prefix(c, toks) == 12
    assert list(c.pages) == shared


@pytest.mark.parametrize('name,make', list(_managers()))
def test_manager_flush_prefix(name, make):
    m = make(6, 4)
    a = m.create(1)
    a.token_ids = list(range(9))
    m.grow(a, 9)
    a.cache_len = 9
    m.release(a)
    m.publish(a)
    m.erase(1)
    assert m.free_count == 4                      # 2 pages in the index
    m.flush_prefix()
    assert m.free_count == 6


CFG = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=128, session_len=128, end_id=2)

ECFG = EngineConfig(max_batch_size=2, session_len=96, page_size=8,
                    num_pages=48, max_context_token_num=16,
                    prefill_buckets=(8, 16, 32), use_pallas=False,
                    step_length=4)

SYSTEM = [3, 7, 11, 19, 23, 29, 31, 37, 41, 43, 47, 53, 59, 61, 67, 71,
          73, 79]                                  # 18-token shared prefix


def _run_engine(ecfg, params, sessions):
    """sessions: list of (sid, prompt); returns {sid: tokens} + stats."""
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        out = {}
        for sid, prompt in sessions:
            out[sid] = inst.infer(sid, prompt, gen_config=GenerationConfig(
                max_new_tokens=10, top_k=1, ignore_eos=True),
                sequence_end=True).token_ids
        return out, dict(eng.stats)
    finally:
        eng.shutdown()


def test_engine_prefix_cache_exact_streams():
    """Sessions sharing a system prompt must stream EXACTLY the tokens a
    cache-disabled engine streams, while skipping the shared prefill."""
    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    sessions = [(1, SYSTEM + [101, 103]),
                (2, SYSTEM + [107, 109, 113]),
                (3, SYSTEM + [101, 103])]          # exact repeat of 1
    off = dataclasses.replace(ECFG, enable_prefix_caching=False)
    want, stats_off = _run_engine(off, params, sessions)
    got, stats_on = _run_engine(ECFG, params, sessions)
    assert got == want
    assert stats_off['prefix_hit_tokens'] == 0
    # 18-token prefix -> 2 full pages (16 tokens) reusable per follower
    assert stats_on['prefix_hit_tokens'] >= 32


def test_engine_prefix_cache_rewind_isolation():
    """A session that rewinds into shared pages must not corrupt another
    session that reuses the same published prefix afterwards."""
    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    prompt = SYSTEM + [101, 103]

    def drive(ecfg):
        eng = TPUEngine(CFG, ecfg, params)
        try:
            inst = eng.create_instance()
            gen = GenerationConfig(max_new_tokens=8, top_k=1,
                                   ignore_eos=True)
            a1 = inst.infer(1, prompt, gen_config=gen).token_ids
            # rewind session 1 into the shared region and regenerate
            a2 = inst.infer(1, [87, 89], gen_config=gen, step=10,
                            sequence_start=False).token_ids
            # a fresh session must still see the INTACT published prefix
            b = inst.infer(2, prompt, gen_config=gen,
                           sequence_end=True).token_ids
            inst.end(1)
            return a1, a2, b
        finally:
            eng.shutdown()

    off = dataclasses.replace(ECFG, enable_prefix_caching=False)
    assert drive(ECFG) == drive(off)


def test_engine_prefix_cache_sampled_reproducible():
    """Prefix hits must not perturb the sampled path: same seed ->
    same stream, caching on or off."""
    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    prompt = SYSTEM + [101]

    def drive(ecfg, sid):
        eng = TPUEngine(CFG, ecfg, params)
        try:
            inst = eng.create_instance()
            gen = GenerationConfig(max_new_tokens=8, top_k=20, top_p=0.9,
                                   temperature=0.9, random_seed=5,
                                   ignore_eos=True)
            first = inst.infer(sid, prompt, gen_config=gen,
                               sequence_end=True).token_ids
            second = inst.infer(sid + 1, prompt, gen_config=gen,
                                sequence_end=True).token_ids
            return first, second
        finally:
            eng.shutdown()

    off = dataclasses.replace(ECFG, enable_prefix_caching=False)
    assert drive(ECFG, 10) == drive(off, 20)


def test_engine_publishes_prompt_during_generation():
    """A long-running generation's prompt must be shareable right after
    its prefill (insert-only publish), not just at retirement."""
    import threading
    import time as _t

    params = init_params(CFG, jax.random.PRNGKey(2), jnp.float32)
    eng = TPUEngine(CFG, ECFG, params)
    try:
        inst = eng.create_instance()
        gen_long = GenerationConfig(max_new_tokens=40, top_k=1,
                                    ignore_eos=True)
        gen_a = inst.stream_infer(1, SYSTEM + [101], gen_long,
                                  sequence_end=True)
        next(gen_a)                       # A prefilled, mid-generation
        results = {}

        def run_b():
            results['b'] = inst.infer(
                2, SYSTEM + [107], gen_config=GenerationConfig(
                    max_new_tokens=4, top_k=1, ignore_eos=True),
                sequence_end=True).token_ids

        tb = threading.Thread(target=run_b)
        tb.start()
        for _ in gen_a:
            pass
        tb.join()
        assert len(results['b']) == 4
        # B admitted while A was still generating: its prefix hit must
        # come from A's insert-only publish
        assert eng.stats['prefix_hit_tokens'] >= 16
    finally:
        eng.shutdown()
