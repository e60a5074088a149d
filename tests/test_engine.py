"""End-to-end engine tests: continuous batching, sessions, cancel, stop
criteria, eviction — the rebuild of the reference's LlamaBatch semantics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import EngineConfig, ModelConfig
from lmdeploy_tpu.engine.engine import TPUEngine
from lmdeploy_tpu.messages import GenerationConfig, ResponseType
from lmdeploy_tpu.models.llama import init_params

CFG = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=128, session_len=128, end_id=2)


@pytest.fixture(scope='module')
def engine():
    ecfg = EngineConfig(max_batch_size=4, session_len=64, page_size=8,
                        num_pages=40, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    yield eng
    eng.shutdown()


def greedy(max_new=8, **kw):
    kw.setdefault('ignore_eos', True)
    return GenerationConfig(max_new_tokens=max_new, top_k=1, **kw)


def collect(gen):
    outs = list(gen)
    assert outs[-1].finished
    return outs


def test_single_request_deterministic(engine):
    inst = engine.create_instance()
    prompt = [1, 5, 9, 13, 21]
    o1 = collect(inst.stream_infer(1, prompt, greedy(), sequence_end=True))
    o2 = collect(inst.stream_infer(1, prompt, greedy(), sequence_end=True))
    assert o1[-1].token_ids == o2[-1].token_ids
    assert len(o1[-1].token_ids) == 8
    assert o1[-1].status == ResponseType.FINISH


def test_streaming_is_incremental(engine):
    inst = engine.create_instance()
    outs = collect(inst.stream_infer(2, [3, 7, 11], greedy(5),
                                     sequence_end=True))
    lens = [o.num_generated for o in outs]
    assert lens == sorted(lens)
    for prev, cur in zip(outs, outs[1:]):
        assert cur.token_ids[:len(prev.token_ids)] == prev.token_ids


def test_concurrent_requests_match_solo_runs(engine):
    inst = engine.create_instance()
    prompts = [[1, 4, 7], [9, 8, 7, 6], [20, 30]]
    solo = [collect(inst.stream_infer(10 + i, p, greedy(6),
                                      sequence_end=True))[-1].token_ids
            for i, p in enumerate(prompts)]
    # now submit all at once on separate sessions via threads
    import threading
    results = {}

    def run(i, p):
        results[i] = collect(inst.stream_infer(20 + i, p, greedy(6),
                                               sequence_end=True))[-1].token_ids

    ts = [threading.Thread(target=run, args=(i, p))
          for i, p in enumerate(prompts)]
    [t.start() for t in ts]
    [t.join(timeout=120) for t in ts]
    assert [results[i] for i in range(3)] == solo


def test_interactive_session_kv_reuse(engine):
    """Two-turn session == single concatenated prompt (KV reuse path)."""
    inst = engine.create_instance()
    p1 = [1, 5, 9]
    out1 = collect(inst.stream_infer(40, p1, greedy(4)))[-1].token_ids
    p2 = [33, 44]
    out2 = collect(inst.stream_infer(40, p2, greedy(4),
                                     sequence_start=False))[-1].token_ids
    # oracle: one shot over full history
    full_prompt = p1 + out1 + p2
    want = collect(inst.stream_infer(41, full_prompt, greedy(4),
                                     sequence_end=True))[-1].token_ids
    assert out2 == want
    inst.end(40)


def test_session_busy_and_not_exist(engine):
    inst = engine.create_instance()
    outs = collect(inst.stream_infer(50, [1, 2, 3], greedy(2),
                                     sequence_start=False))
    assert outs[-1].status == ResponseType.SESSION_NOT_EXIST


def test_stop_word_single_token(engine):
    inst = engine.create_instance()
    # First find what greedy generates, then stop at its 3rd token.
    base = collect(inst.stream_infer(60, [2, 4, 6], greedy(6),
                                     sequence_end=True))[-1].token_ids
    stop_tok = base[2]
    cfg = GenerationConfig(max_new_tokens=6, top_k=1, ignore_eos=True,
                           stop_words=[stop_tok])
    got = collect(inst.stream_infer(61, [2, 4, 6], cfg,
                                    sequence_end=True))[-1].token_ids
    assert got == base[:2]  # stop word excluded from output, gen halted


def test_stop_sequence_multi_token(engine):
    inst = engine.create_instance()
    base = collect(inst.stream_infer(62, [2, 4, 6], greedy(6),
                                     sequence_end=True))[-1].token_ids
    stop_seq = base[1:3]
    cfg = GenerationConfig(max_new_tokens=6, top_k=1, ignore_eos=True,
                           stop_words=[list(stop_seq)])
    outs = collect(inst.stream_infer(63, [2, 4, 6], cfg,
                                     sequence_end=True))
    # stop sequence excluded from the final output...
    assert outs[-1].token_ids == base[:1]
    # ...and its prefix never streamed (holdback): no intermediate frame
    # may show a token that later turns out to be stop text
    for o in outs:
        assert o.token_ids == base[:len(o.token_ids)]
        assert len(o.token_ids) <= 1


def test_batched_concurrent_admission_prefill(engine):
    """Simultaneous admissions with long (chunked) prompts run through
    the batched multi-slot prefill pass and must produce the same
    streams as solo runs (reference: LlamaBatch batches context decode
    across new requests, LlamaBatch.cc:795-858)."""
    import threading

    inst = engine.create_instance()
    rng = np.random.default_rng(7)
    prompts = {200 + i: rng.integers(3, 120, size=n).tolist()
               for i, n in enumerate((40, 25, 33))}  # all > 16 budget
    solo = {sid: collect(inst.stream_infer(sid, p, greedy(4),
                                           sequence_end=True))[-1].token_ids
            for sid, p in prompts.items()}

    got = {}

    def run(sid, p):
        got[sid] = collect(inst.stream_infer(
            sid + 50, p, greedy(4), sequence_end=True))[-1].token_ids

    ts = [threading.Thread(target=run, args=(sid, p))
          for sid, p in prompts.items()]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    for sid, p in prompts.items():
        assert got[sid] == solo[sid], sid


def test_prefill_decode_interleaving():
    """A running session must keep streaming while another session's
    long prompt prefills (SARATHI-style chunked-prefill scheduling,
    beyond-reference: the reference stalls generation for the whole
    context decode).  Streams must stay exactly equal to solo runs."""
    import threading

    ecfg = EngineConfig(max_batch_size=4, session_len=128, page_size=8,
                        num_pages=80, max_context_token_num=8,
                        prefill_buckets=(8,), use_pallas=False,
                        step_length=4, prefill_interleave=2)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        rng = np.random.default_rng(3)
        long_prompt = rng.integers(3, 120, size=60).tolist()  # 8 chunks
        solo_a = collect(inst.stream_infer(1, [5, 9, 13], greedy(60),
                                           sequence_end=True))[-1].token_ids
        solo_b = collect(inst.stream_infer(2, long_prompt, greedy(4),
                                           sequence_end=True))[-1].token_ids

        results = {}

        def run_b():
            results['b'] = collect(inst.stream_infer(
                4, long_prompt, greedy(4),
                sequence_end=True))[-1].token_ids

        # deterministic overlap: submit B only after A streamed its
        # first token (so A is mid-decode), then drain A on this thread —
        # A still has ~59 tokens / 15+ rounds left when B's 8-chunk
        # prefill runs, so the interleaved rounds must fire
        gen_a = inst.stream_infer(3, [5, 9, 13], greedy(60),
                                  sequence_end=True)
        out_a = next(gen_a)
        tb = threading.Thread(target=run_b)
        tb.start()
        for out_a in gen_a:
            pass
        tb.join()
        assert out_a.token_ids == solo_a
        assert results['b'] == solo_b
        assert eng.stats['interleaved_rounds'] > 0
    finally:
        eng.shutdown()


def test_max_new_tokens(engine):
    inst = engine.create_instance()
    outs = collect(inst.stream_infer(70, [1, 2], greedy(3),
                                     sequence_end=True))
    assert len(outs[-1].token_ids) == 3


def test_queue_full_backpressure():
    """Bounded request queue: beyond max_pending_requests the engine
    answers QUEUE_FULL instead of queueing unboundedly (the reference
    blocks forever in its RequestQueue — a serving engine must shed)."""
    ecfg = EngineConfig(max_batch_size=1, session_len=64, page_size=8,
                        num_pages=16, max_context_token_num=16,
                        prefill_buckets=(8,), use_pallas=False,
                        step_length=2, max_pending_requests=1)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        import threading
        results = {}

        def run(sid):
            results[sid] = collect(inst.stream_infer(
                sid, [1, 2, 3], greedy(30), sequence_end=True))[-1].status

        ts = [threading.Thread(target=run, args=(sid,))
              for sid in (1, 2, 3, 4, 5)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        statuses = list(results.values())
        assert statuses.count(ResponseType.QUEUE_FULL) >= 1
        assert statuses.count(ResponseType.FINISH) >= 1
        assert eng.metrics()['rejected'] >= 1
    finally:
        eng.shutdown()


def test_request_timeout():
    """A request that waits in the queue past request_timeout gets a
    TIMEOUT answer instead of hanging."""
    ecfg = EngineConfig(max_batch_size=1, session_len=64, page_size=8,
                        num_pages=16, max_context_token_num=16,
                        prefill_buckets=(8,), use_pallas=False,
                        step_length=1, request_timeout=0.001)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        import threading
        results = {}

        def run(sid, n):
            results[sid] = collect(inst.stream_infer(
                sid, [1, 2, 3], greedy(n), sequence_end=True))[-1].status

        t1 = threading.Thread(target=run, args=(1, 40))
        t1.start()
        import time as _t
        _t.sleep(0.2)  # let request 1 occupy the only slot
        t2 = threading.Thread(target=run, args=(2, 4))
        t2.start()
        t1.join()
        t2.join()
        assert results[1] == ResponseType.FINISH
        assert results[2] == ResponseType.TIMEOUT
        assert eng.metrics()['timeout'] >= 1
    finally:
        eng.shutdown()


def test_long_prompt_chunked_prefill(engine):
    """Prompt longer than max_context_token_num forces chunking; result
    must match an unchunked run via a second engine config oracle —
    here we check self-consistency: decode() logits vs generation path."""
    inst = engine.create_instance()
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 120, size=40).tolist()  # > 16 budget -> 3 chunks
    out = collect(inst.stream_infer(80, prompt, greedy(2),
                                    sequence_end=True))[-1].token_ids
    logits = inst.decode(prompt + out[:1])
    assert logits.shape == (41, CFG.vocab_size)
    # the engine's first generated token must equal argmax of prompt logits
    assert out[0] == int(np.argmax(logits[39]))
    assert out[1] == int(np.argmax(logits[40]))


def test_eviction_and_recompute(engine):
    """Fill the page pool with parked sessions, force eviction, then
    continue the evicted session — must re-decode and match."""
    inst = engine.create_instance()
    p1 = [11, 22, 33]
    out1 = collect(inst.stream_infer(90, p1, greedy(4)))[-1].token_ids
    # park session 90; now burn pages with other sessions (10 sessions x
    # 32 tokens = 40 pages > pool, forcing LRU eviction of session 90)
    for i in range(10):
        collect(inst.stream_infer(91 + i, list(range(3, 31)), greedy(4)))
    seq = engine.seqs.get(90)
    assert seq is not None and seq.cache_len == 0 and not seq.pages, \
        'session 90 should have been LRU-evicted'
    # continue session 90: engine must re-prefill from retained token ids
    p2 = [44, 55]
    out2 = collect(inst.stream_infer(90, p2, greedy(4),
                                     sequence_start=False))[-1].token_ids
    want = collect(inst.stream_infer(100, p1 + out1 + p2, greedy(4),
                                     sequence_end=True))[-1].token_ids
    assert out2 == want
    for i in range(10):
        inst.end(91 + i)
    inst.end(90)


def test_input_too_long(engine):
    inst = engine.create_instance()
    outs = collect(inst.stream_infer(110, list(range(3, 3 + 70)), greedy(4),
                                     sequence_end=True))
    assert outs[-1].status == ResponseType.INPUT_TOO_LONG


def test_random_seed_reproducible(engine):
    inst = engine.create_instance()
    cfg = GenerationConfig(max_new_tokens=6, top_k=40, temperature=1.0,
                           random_seed=1234, ignore_eos=True)
    a = collect(inst.stream_infer(120, [5, 6, 7], cfg,
                                  sequence_end=True))[-1].token_ids
    b = collect(inst.stream_infer(121, [5, 6, 7], cfg,
                                  sequence_end=True))[-1].token_ids
    assert a == b


def test_native_cache_manager_parity():
    """The C++ cache manager mirrors the Python SequenceManager semantics
    (alloc/grow/LRU-evict/token retention/rng snapshot)."""
    pytest.importorskip('ctypes')
    from lmdeploy_tpu.kvcache.manager import NoFreePages
    from lmdeploy_tpu.kvcache.native import NativeSequenceManager, load
    if load() is None:
        pytest.skip('libtpucache.so not built')
    m = NativeSequenceManager(num_pages=4, page_size=8, max_entries=0)
    a = m.create(1)
    a.token_ids = [1, 2, 3]
    m.grow(a, 3)
    assert len(a.pages) == 1 and m.free_count == 3
    a.cache_len = 3
    a.token_ids.append(9)
    assert list(a.token_ids) == [1, 2, 3, 9]
    a.rng_key = np.asarray([7, 8], np.uint32)
    assert a.rng_key.tolist() == [7, 8]
    m.release(a)
    # pressure: new sequence needs all pages -> evicts seq 1 (inactive)
    b = m.create(2)
    m.grow(b, 32)
    assert len(b.pages) == 4
    a2 = m.fetch(1)
    assert a2 is not None and a2.cache_len == 0 and not a2.pages
    assert list(a2.token_ids) == [1, 2, 3, 9]  # tokens survive eviction
    b.active = True
    c = m.create(3)
    with pytest.raises(NoFreePages):
        m.grow(c, 8)  # b active, nothing evictable
    m.erase(2)
    m.grow(c, 8)
    assert len(c.pages) == 1


def test_session_repeat_rejected(engine):
    """Duplicate session ids within one drained request batch get
    SESSION_REPEAT (reference: verifyRequests, Request.h:28-35)."""
    import queue as _q
    from lmdeploy_tpu.messages import EngineRequest, GenerationConfig
    q1, q2 = _q.Queue(), _q.Queue()
    r1 = EngineRequest(session_id=777, input_ids=[1, 2, 3],
                       gen_config=greedy(2), sequence_end=True)
    r2 = EngineRequest(session_id=777, input_ids=[1, 2],
                       gen_config=greedy(2), sequence_end=True)
    import time as _t
    now = _t.monotonic()
    engine._requests.put((r1, q1, now))
    engine._requests.put((r2, q2, now))
    # one of the two must be rejected with SESSION_REPEAT (the longer one
    # wins admission), the other completes
    outs1, outs2 = [], []
    for q, outs in ((q1, outs1), (q2, outs2)):
        while True:
            out = q.get(timeout=60)
            outs.append(out)
            if out.finished:
                break
    statuses = {outs1[-1].status, outs2[-1].status}
    assert ResponseType.SESSION_REPEAT in statuses
    assert ResponseType.FINISH in statuses


def test_prompt_longer_than_largest_bucket():
    """Chunk budget must respect the largest prefill bucket even when
    max_context_token_num is larger (review finding: >bucket prompts
    crashed mid-admission and streamed garbage)."""
    params = init_params(CFG, jax.random.PRNGKey(1), jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, session_len=128, page_size=8,
                        num_pages=48, max_context_token_num=4096,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=2)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        prompt = list(np.random.default_rng(3).integers(3, 120, size=50))
        out = inst.infer(1, prompt, gen_config=greedy(3), sequence_end=True)
        assert out.status == ResponseType.FINISH
        logits = inst.decode(prompt)  # same cap on the logits path
        assert logits.shape[0] == 50
        assert out.token_ids[0] == int(np.argmax(logits[-1]))
    finally:
        eng.shutdown()


def test_cancel_pending_request(engine):
    """A request parked in _pending (no free slot) must be cancellable."""
    import queue as _q
    from lmdeploy_tpu.messages import EngineRequest
    # fill all 4 slots with long generations
    qs = []
    for i in range(4):
        req = EngineRequest(session_id=300 + i, input_ids=[1, 2, 3],
                            gen_config=greedy(40), sequence_end=True)
        qs.append(engine.submit(req))
    # 5th request has nowhere to go -> pending
    req5 = EngineRequest(session_id=399, input_ids=[4, 5],
                         gen_config=greedy(4), sequence_end=True)
    q5 = engine.submit(req5)
    import time as _t
    _t.sleep(0.5)
    engine.cancel(399)
    while True:
        out = q5.get(timeout=60)
        if out.finished:
            break
    assert out.status in (ResponseType.CANCELED, ResponseType.FINISH)
    for q in qs:  # drain the four runners
        while True:
            if q.get(timeout=120).finished:
                break


def test_output_logprobs(engine):
    """Per-token logprobs stream with the tokens (reference:
    logprob_kernels.cu); greedy over a single candidate is exactly 0."""
    inst = engine.create_instance()
    cfg = GenerationConfig(max_new_tokens=4, top_k=1, ignore_eos=True,
                           output_logprobs=True)
    out = inst.infer(500, [3, 9, 27], gen_config=cfg, sequence_end=True)
    assert out.logprobs is not None and len(out.logprobs) == 4
    assert all(abs(lp) < 1e-5 for lp in out.logprobs)  # top_k=1 => log 1
    cfg2 = GenerationConfig(max_new_tokens=4, top_k=40, temperature=1.0,
                            ignore_eos=True, output_logprobs=True,
                            random_seed=7)
    out2 = inst.infer(501, [3, 9, 27], gen_config=cfg2, sequence_end=True)
    assert len(out2.logprobs) == 4
    assert all(lp <= 0.0 for lp in out2.logprobs)


def test_top_logprobs_generated(engine):
    """Top-N alternative logprobs for GENERATED tokens (OpenAI
    top_logprobs; device readback planes in decode_steps)."""
    inst = engine.create_instance()
    cfg = GenerationConfig(max_new_tokens=4, top_k=1, ignore_eos=True,
                           top_logprobs=3)
    out = inst.infer(510, [3, 9, 27], gen_config=cfg, sequence_end=True)
    assert out.top_logprobs is not None and len(out.top_logprobs) == 4
    for tok, tops in zip(out.token_ids, out.top_logprobs):
        assert len(tops) == 3
        # greedy: the chosen token IS the best alternative
        best = max(tops, key=tops.get)
        assert best == tok
        assert all(lp <= 1e-5 for lp in tops.values())
    # alternatives come from the pre-filter distribution: all finite
    assert all(np.isfinite(list(t.values())).all()
               for t in out.top_logprobs)
    # sampled request: chosen token must appear among its alternatives
    # whenever it ranks top-3 — at minimum dicts are well-formed
    cfg2 = GenerationConfig(max_new_tokens=3, top_k=40, temperature=1.0,
                            ignore_eos=True, top_logprobs=2,
                            random_seed=11)
    out2 = inst.infer(511, [3, 9, 27], gen_config=cfg2, sequence_end=True)
    assert len(out2.top_logprobs) == 3
    assert all(len(t) == 2 for t in out2.top_logprobs)
    # plain logprobs stream alongside even without output_logprobs=True
    assert out2.logprobs is not None and len(out2.logprobs) == 3


def test_top_logprobs_temperature_zero_meaningful(engine):
    """temperature=0 (clamped to 1e-5) must NOT degrade top_logprobs to
    a degenerate point mass: the planes report at temperature 1.0 (the
    model distribution — vLLM's greedy-logprobs convention), so the
    values match an explicit temperature=1.0 greedy request."""
    inst = engine.create_instance()
    cfg0 = GenerationConfig(max_new_tokens=3, top_k=1, temperature=0.0,
                            ignore_eos=True, top_logprobs=3)
    cfg1 = GenerationConfig(max_new_tokens=3, top_k=1, temperature=1.0,
                            ignore_eos=True, top_logprobs=3)
    out0 = inst.infer(512, [3, 9, 27], gen_config=cfg0, sequence_end=True)
    out1 = inst.infer(513, [3, 9, 27], gen_config=cfg1, sequence_end=True)
    assert out0.token_ids == out1.token_ids
    for t0, t1 in zip(out0.top_logprobs, out1.top_logprobs):
        assert set(t0) == set(t1)
        for k in t0:
            assert t0[k] == pytest.approx(t1[k], abs=1e-3)
        # model-scale values, not the 1e-5-scaled degenerate planes
        assert all(lp > -100.0 for lp in t0.values())


def test_top_logprobs_mixed_batch(engine):
    """A top_logprobs slot and a plain slot in the same rounds: planes
    only attach to the requesting slot."""
    import threading
    inst = engine.create_instance()
    res = {}

    def run(sid, gcfg):
        res[sid] = inst.infer(sid, [5, sid % 32], gen_config=gcfg,
                              sequence_end=True)

    t1 = threading.Thread(target=run, args=(
        520, GenerationConfig(max_new_tokens=5, top_k=1, ignore_eos=True,
                              top_logprobs=2)))
    t2 = threading.Thread(target=run, args=(
        521, GenerationConfig(max_new_tokens=5, top_k=1,
                              ignore_eos=True)))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert len(res[520].top_logprobs) == 5
    assert all(len(t) == 2 for t in res[520].top_logprobs)
    assert res[521].top_logprobs is None


def test_qwen_style_flags_end_to_end():
    """Dynamic NTK + logn + qkv bias engine run (qwen family flags)."""
    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=16, max_position_embeddings=32,
                      session_len=128, end_id=2, attn_bias=True,
                      qkv_bias_only=True, use_dynamic_ntk=True,
                      use_logn_attn=True)
    params = init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
    ecfg = EngineConfig(max_batch_size=2, session_len=96, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=4)
    eng = TPUEngine(cfg, ecfg, params)
    try:
        inst = eng.create_instance()
        # prompt longer than max_position_embeddings exercises the
        # dynamic-NTK base recompute + logn scaling beyond train length
        prompt = list(np.random.default_rng(6).integers(3, 120, size=40))
        out = inst.infer(1, prompt, gen_config=greedy(6), sequence_end=True)
        assert out.status == ResponseType.FINISH and len(out.token_ids) == 6
        out2 = inst.infer(2, prompt, gen_config=greedy(6), sequence_end=True)
        assert out.token_ids == out2.token_ids
    finally:
        eng.shutdown()


def test_rope_scaling_yarn_end_to_end():
    """YaRN rope-scaled engine run: prompts past the original trained
    length generate deterministically, and the scaled model diverges
    from the unscaled one (the tables really changed)."""
    kw = dict(head_num=2, kv_head_num=2, size_per_head=16,
              inter_size=64, num_layer=2, vocab_size=128,
              rotary_embedding=16, max_position_embeddings=32,
              session_len=128, end_id=2)
    ecfg = EngineConfig(max_batch_size=2, session_len=96, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False,
                        step_length=4)
    prompt = list(np.random.default_rng(8).integers(3, 120, size=40))
    outs = {}
    for name, extra in [('plain', {}),
                        ('yarn', dict(rope_scaling_type='yarn',
                                      rope_scaling_factor=4.0,
                                      rope_original_max_position=32))]:
        cfg = ModelConfig(**kw, **extra)
        params = init_params(cfg, jax.random.PRNGKey(5), jnp.float32)
        # tiny random init makes q.k ~ 0 and softmax near-uniform, so
        # rope barely moves the logits; amplify qkv so attention scores
        # (and therefore the rope tables) actually steer the argmax
        params['layers']['wqkv'] = params['layers']['wqkv'] * 8.0
        eng = TPUEngine(cfg, ecfg, params)
        try:
            inst = eng.create_instance()
            out = inst.infer(1, prompt, gen_config=greedy(6),
                             sequence_end=True)
            assert out.status == ResponseType.FINISH
            assert len(out.token_ids) == 6
            out2 = inst.infer(2, prompt, gen_config=greedy(6),
                              sequence_end=True)
            assert out.token_ids == out2.token_ids
            outs[name] = out.token_ids
        finally:
            eng.shutdown()
    assert outs['plain'] != outs['yarn']


def test_frequency_penalty_end_to_end():
    """GenerationConfig.frequency_penalty reaches the device sampling
    state: a strong count-scaled penalty must change the greedy stream
    (it penalizes every seen token, prompt included), and stay
    deterministic."""
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=16, max_context_token_num=16,
                        prefill_buckets=(8,), use_pallas=False,
                        step_length=4)
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        prompt = [5, 9, 13]
        outs = {}
        for fp in (0.0, 8.0):
            gen = GenerationConfig(max_new_tokens=10, top_k=1,
                                   ignore_eos=True, frequency_penalty=fp)
            out = inst.infer(1, prompt, gen_config=gen, sequence_end=True)
            assert out.status == ResponseType.FINISH
            out2 = inst.infer(2, prompt, gen_config=gen, sequence_end=True)
            assert out.token_ids == out2.token_ids
            outs[fp] = out.token_ids
        assert outs[0.0] != outs[8.0]
    finally:
        eng.shutdown()


def test_stop_word_overflow_past_device_capacity(engine):
    """Vocab-scan stop expansion can yield hundreds of single-token stops;
    ids past the 32-slot device stop_words capacity must still stop
    generation (matched host-side instead of silently dropped)."""
    from lmdeploy_tpu.ops.sampling import MAX_STOP_BAD_WORDS as CAP
    inst = engine.create_instance()
    base = collect(inst.stream_infer(70, [3, 5, 7], greedy(6),
                                     sequence_end=True))[-1].token_ids
    stop_tok = base[2]
    # decoys that greedy never emits, placed BEFORE the real stop so it
    # lands past the device capacity
    decoys = [t for t in range(2000, 2000 + CAP + 4) if t != stop_tok]
    cfg = GenerationConfig(max_new_tokens=6, top_k=1, ignore_eos=True,
                           stop_words=decoys[:CAP + 2] + [stop_tok])
    got = collect(inst.stream_infer(71, [3, 5, 7], cfg,
                                    sequence_end=True))[-1].token_ids
    assert got == base[:2]  # stopped, stop token excluded


def test_engine_survives_dispatch_and_recovery_failure():
    """A backend execution error on the plain decode path fails the
    in-flight requests — and if the state re-allocation ALSO fails
    (e.g. device memory still held), the engine thread must survive and
    recover on a later turn instead of dying with clients queued."""
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=24, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False)
    params = init_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        # prime compiles
        out = inst.infer(1, [3, 9], gen_config=greedy(2), sequence_end=True)
        assert out.status == ResponseType.FINISH

        real_steps = eng.fns.decode_steps
        real_alloc = eng._alloc_device_state
        fails = {'steps': 1, 'alloc': 1}

        def bad_steps(*a, **k):
            if fails['steps']:
                fails['steps'] -= 1
                raise RuntimeError('RESOURCE_EXHAUSTED (simulated)')
            return real_steps(*a, **k)

        def bad_alloc(*a, **k):
            if fails['alloc']:
                fails['alloc'] -= 1
                raise RuntimeError('still exhausted (simulated)')
            return real_alloc(*a, **k)

        eng.fns.decode_steps = bad_steps
        eng._alloc_device_state = bad_alloc
        out = inst.infer(2, [5, 7], gen_config=greedy(4),
                         sequence_end=True)
        assert out.status == ResponseType.INTERNAL_ERROR
        assert fails['steps'] == 0
        # engine thread alive and serving after the double failure
        out = inst.infer(3, [3, 9], gen_config=greedy(3),
                         sequence_end=True)
        assert out.status == ResponseType.FINISH
        assert len(out.token_ids) == 3
        assert fails['alloc'] == 0
    finally:
        eng.shutdown()


def test_dead_engine_fails_fast():
    """Requests to a shut-down (or crashed) engine return INTERNAL_ERROR
    instead of blocking forever on a queue no thread will feed."""
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=24, max_context_token_num=16,
                        prefill_buckets=(8, 16), use_pallas=False)
    params = init_params(CFG, jax.random.PRNGKey(3), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    inst = eng.create_instance()
    eng.shutdown()
    out = inst.infer(1, [3, 9], gen_config=greedy(2), sequence_end=True)
    assert out.status == ResponseType.INTERNAL_ERROR
    assert out.finished
