"""Serving-layer tests: AsyncEngine streaming + the OpenAI HTTP server
(aiohttp TestClient, no sockets) — covers the reference's api_server
endpoints /v1/models, /v1/chat/completions (stream & non-stream),
/v1/embeddings, /generate."""
import asyncio
import json

import pytest

import jax
import jax.numpy as jnp

from lmdeploy_tpu.config import EngineConfig, ModelConfig
from lmdeploy_tpu.engine.engine import TPUEngine
from lmdeploy_tpu.serve.async_engine import AsyncEngine

CFG = ModelConfig(model_name='tiny', head_num=2, kv_head_num=2,
                  size_per_head=16, inter_size=64, num_layer=2,
                  vocab_size=512, rotary_embedding=16,
                  max_position_embeddings=256, session_len=256, end_id=2)
ECFG = EngineConfig(max_batch_size=4, session_len=128, page_size=8,
                    num_pages=64, max_context_token_num=32,
                    prefill_buckets=(16, 32), use_pallas=False,
                    step_length=4)


@pytest.fixture(scope='module')
def async_engine(tmp_path_factory):
    from lmdeploy_tpu.convert.converter import save_workspace
    from lmdeploy_tpu.models.llama import init_params
    ws = tmp_path_factory.mktemp('ws')
    params = init_params(CFG, jax.random.PRNGKey(0), jnp.float32)
    save_workspace(str(ws), CFG, params, ECFG)
    eng = AsyncEngine(str(ws), instance_num=2)
    yield eng
    eng.shutdown()


def drain(agen):
    async def run():
        out = []
        async for item in agen:
            out.append(item)
        return out
    return asyncio.run(run())


def test_async_engine_generate_stream(async_engine):
    outs = drain(async_engine.generate('hello world', 1,
                                       request_output_len=6,
                                       ignore_eos=True, top_k=1,
                                       sequence_end=True))
    assert outs, 'no outputs'
    assert outs[-1].finish_reason in ('stop', 'length')
    assert outs[-1].generate_token_len > 0


def test_async_engine_openai_session_resume(async_engine):
    o1 = drain(async_engine.generate_openai('turn one', 7,
                                            request_output_len=4,
                                            ignore_eos=True, top_k=1))
    assert o1[-1].generate_token_len > 0
    # continuation should reuse the session (steps > 0 -> not seq start)
    o2 = drain(async_engine.generate_openai('turn two', 7,
                                            request_output_len=4,
                                            ignore_eos=True, top_k=1))
    assert o2[-1].generate_token_len > 0
    assert async_engine.steps['7'] > 0
    drain(async_engine.generate_openai('fresh', 7, renew_session=True,
                                       request_output_len=2,
                                       ignore_eos=True, top_k=1))


def test_api_server_endpoints(async_engine):
    from aiohttp.test_utils import TestClient, TestServer
    from lmdeploy_tpu.serve.openai.api_server import build_app

    async def run():
        app = build_app(async_engine)
        async with TestClient(TestServer(app)) as client:
            r = await client.get('/v1/models')
            assert r.status == 200
            models = await r.json()
            assert models['data'][0]['id'] == 'tiny'

            payload = {'model': 'tiny', 'messages': 'hi there',
                       'max_tokens': 4, 'ignore_eos': True}
            r = await client.post('/v1/chat/completions', json=payload)
            assert r.status == 200
            body = await r.json()
            assert body['choices'][0]['message']['role'] == 'assistant'
            assert body['usage']['completion_tokens'] > 0

            r = await client.post('/v1/chat/completions',
                                  json={**payload, 'stream': True})
            assert r.status == 200
            text = (await r.read()).decode()
            assert 'data:' in text and '[DONE]' in text

            r = await client.post('/v1/chat/completions',
                                  json={**payload, 'model': 'nope'})
            assert r.status == 404

            # OpenAI chat logprobs + top_logprobs on generated tokens
            r = await client.post('/v1/chat/completions', json={
                **payload, 'logprobs': True, 'top_logprobs': 3,
                'renew_session': True})
            assert r.status == 200
            body = await r.json()
            lp = body['choices'][0]['logprobs']
            content = lp['content']
            assert len(content) == body['usage']['completion_tokens']
            for e in content:
                assert isinstance(e['token'], str)
                assert e['logprob'] <= 1e-5
                assert e['bytes'] == list(e['token'].encode('utf-8'))
                assert len(e['top_logprobs']) == 3
                # alternatives sort best-first
                alt_lps = [a['logprob'] for a in e['top_logprobs']]
                assert alt_lps == sorted(alt_lps, reverse=True)

            r = await client.post('/v1/embeddings',
                                  json={'input': 'abc'})
            assert r.status == 200
            emb = await r.json()
            assert isinstance(emb['data'][0]['embedding'], list)

            r = await client.post('/generate', json={
                'prompt': 'once upon', 'instance_id': 99,
                'request_output_len': 4, 'ignore_eos': True,
                'sequence_end': True})
            assert r.status == 200
            gen = await r.json()
            assert gen['tokens'] > 0

            # streaming /generate
            r = await client.post('/generate', json={
                'prompt': 'zap', 'instance_id': 98, 'stream': True,
                'request_output_len': 4, 'ignore_eos': True,
                'sequence_end': True})
            lines = [json.loads(x) for x in (await r.read()).decode()
                     .strip().splitlines() if x.strip()]
            assert lines and lines[-1]['tokens'] > 0

            # /metrics: prometheus text with counters + gauges
            r = await client.get('/metrics')
            assert r.status == 200
            text = await r.text()
            assert 'lmdeploy_generated_tokens_total' in text
            assert 'lmdeploy_slots_busy' in text
            tok_line = [ln for ln in text.splitlines()
                        if ln.startswith('lmdeploy_generated_tokens_total ')]
            assert float(tok_line[0].split()[1]) > 0

    asyncio.run(run())


def test_gradio_callbacks_headless(async_engine):
    """The gradio app's chat/cancel/reset handlers work against the real
    AsyncEngine even without gradio installed (stub gr module) — covers
    the reference's chat_stream_local / cancel / reset behaviors
    (lmdeploy/serve/gradio/app.py:333-445)."""
    import types

    from lmdeploy_tpu.serve.gradio import app as gapp

    calls = {}

    class _Ctx:
        def __init__(self, *a, **k):
            pass

        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

    def _component(name):
        def make(*a, **k):
            calls.setdefault('components', []).append(name)
            return types.SimpleNamespace(
                submit=lambda *a, **k: None, click=lambda *a, **k: None)
        return make

    gr = types.SimpleNamespace(
        Blocks=_Ctx, Column=_Ctx, Row=_Ctx,
        State=_component('state'), Chatbot=_component('chatbot'),
        Textbox=_component('textbox'), Button=_component('button'),
        Slider=_component('slider'), Markdown=_component('markdown'),
        update=lambda **k: k, Request=object)

    handlers = {}
    orig_component = gr.Textbox

    def capture_textbox(*a, **k):
        c = orig_component(*a, **k)
        c.submit = lambda fn, *a, **k: handlers.setdefault('chat', fn)
        return c
    gr.Textbox = capture_textbox

    orig_btn = gr.Button
    btn_count = [0]

    def capture_btn(*a, **k):
        c = orig_btn(*a, **k)
        name = 'cancel' if btn_count[0] == 0 else 'reset'
        btn_count[0] += 1
        c.click = lambda fn, *a, **k: handlers.setdefault(name, fn)
        return c
    gr.Button = capture_btn

    gapp.build_blocks(async_engine, gr)
    assert set(handlers) == {'chat', 'cancel', 'reset'}

    req = types.SimpleNamespace(session_hash='abc')

    async def run_chat():
        frames = []
        async for frame in handlers['chat']('hi there', [], None, None,
                                            8, 0.8, 0.01, req):
            frames.append(frame)
        return frames

    frames = asyncio.run(run_chat())
    assert len(frames) >= 3
    final_history = frames[-1][0]
    assert final_history[-1][0] == 'hi there'
    assert isinstance(final_history[-1][1], str)
    # cancel + reset round-trip without error
    out = asyncio.run(handlers['cancel']([], None, None, req))
    assert out[1] == {'interactive': False}
    out = asyncio.run(handlers['reset']([], req))
    assert out == ([], [])


def test_session_id_stable_across_processes():
    """Session ids must not depend on Python's per-process hash salt
    (the reference's ip2id is stable only within a run; ours must
    survive server restarts for interactive continuations)."""
    import hashlib

    from aiohttp.test_utils import make_mocked_request
    from lmdeploy_tpu.serve.openai.api_server import _session_id

    req = make_mocked_request('POST', '/v1/chat/completions',
                              headers={'X-Session-Id': 'sess'})
    got = _session_id(req)
    host = (req.remote or '127.0.0.1') + 'sess'
    want = int.from_bytes(hashlib.md5(host.encode()).digest()[:4],
                          'big') % (2 ** 30)
    assert got == want  # deterministic formula, no hash() salt


def test_gen_config_expands_stop_strings(async_engine):
    """Stop STRINGS entering the serving layer must become engine stop
    sequences — multi-token encodings included (parity fix: these were
    silently dropped at the tokenizer layer before)."""
    gc = async_engine._gen_config(8, 1, 1.0, 1.0, 1.0, False, None,
                                  stop_strings='xyz')
    want = async_engine.tokenizer.encode('xyz')
    assert len(want) > 1
    assert any(w == want for w in gc.stop_words if isinstance(w, list))
    # single-char stop strings stay single-token stop ids
    gc1 = async_engine._gen_config(8, 1, 1.0, 1.0, 1.0, False, None,
                                   stop_strings=['q'])
    tid = async_engine.tokenizer.encode('q')
    assert len(tid) == 1 and tid[0] in gc1.stop_words


def test_stream_holds_partial_utf8_frames(async_engine, monkeypatch):
    """A frame whose delta decodes to a trailing replacement char (a
    multi-byte UTF-8 char split across byte-fallback tokens) is held
    back and re-decoded with the next token, so clients never see '�'
    flicker (beyond-reference: the reference emits it)."""
    def fake_decode(ids, offset=None):
        n = len(ids) - (offset or 0)
        return '�' if n == 1 else 'y' * n

    monkeypatch.setattr(async_engine.tokenizer, 'decode', fake_decode)
    outs = drain(async_engine.generate('partial utf8', 31,
                                       request_output_len=4,
                                       ignore_eos=True, top_k=1,
                                       sequence_end=True))
    texts = [o.response for o in outs]
    assert all('�' not in t for t in texts[:-1])
    # held tokens are emitted once the char completes: all 4 tokens
    # reach the client as 'y's across the stream
    assert sum(t.count('y') for t in texts) == 4


def test_completions_v1_endpoint(async_engine):
    """/v1/completions: raw-prompt continuation (no chat template), list
    prompts -> one choice per prompt, echo, and SSE streaming
    (beyond-reference: the reference ships the Completion* schemas but
    never mounts the endpoint)."""
    from aiohttp.test_utils import TestClient, TestServer
    from lmdeploy_tpu.serve.openai.api_server import build_app

    async def run():
        app = build_app(async_engine)
        async with TestClient(TestServer(app)) as client:
            payload = {'model': 'tiny', 'prompt': 'once upon',
                       'max_tokens': 4, 'ignore_eos': True}
            r = await client.post('/v1/completions', json=payload)
            assert r.status == 200
            body = await r.json()
            assert body['object'] == 'text_completion'
            assert body['choices'][0]['finish_reason'] == 'length'
            assert body['usage']['completion_tokens'] == 4

            # echo prepends the prompt text
            r = await client.post('/v1/completions',
                                  json={**payload, 'echo': True})
            assert (await r.json())['choices'][0]['text'].startswith(
                'once upon')

            # list of prompts -> one choice per prompt, indexed
            r = await client.post('/v1/completions', json={
                **payload, 'prompt': ['alpha beta', 'gamma delta']})
            body = await r.json()
            assert [c['index'] for c in body['choices']] == [0, 1]
            assert body['usage']['completion_tokens'] == 8

            # SSE streaming
            r = await client.post('/v1/completions',
                                  json={**payload, 'stream': True})
            assert r.status == 200
            text = (await r.read()).decode()
            assert 'text_completion' in text and '[DONE]' in text

            # streaming a prompt list is a 400, not a hang
            r = await client.post('/v1/completions', json={
                **payload, 'prompt': ['a', 'b'], 'stream': True})
            assert r.status == 400

    asyncio.run(run())


def test_completions_logprobs(async_engine):
    """/v1/completions with logprobs returns the chosen-token logprob
    stream (tokens / token_logprobs / text_offset aligned)."""
    from aiohttp.test_utils import TestClient, TestServer
    from lmdeploy_tpu.serve.openai.api_server import build_app

    async def run():
        app = build_app(async_engine)
        async with TestClient(TestServer(app)) as client:
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': 'abc', 'max_tokens': 4,
                'ignore_eos': True, 'logprobs': 1})
            assert r.status == 200
            lp = (await r.json())['choices'][0]['logprobs']
            assert lp is not None
            assert len(lp['tokens']) == 4
            assert len(lp['token_logprobs']) == 4
            assert all(isinstance(x, float) for x in lp['token_logprobs'])
            assert all(x <= 0.0 for x in lp['token_logprobs'])
            assert lp['text_offset'] == sorted(lp['text_offset'])

    asyncio.run(run())


def test_completions_n_and_scoring(async_engine):
    """n>1 returns n choices per prompt; max_tokens=0 + echo + logprobs
    is the lm-eval loglikelihood pattern: prompt tokens scored through
    the prompt-logits path, first token_logprob null."""
    from aiohttp.test_utils import TestClient, TestServer
    from lmdeploy_tpu.serve.openai.api_server import build_app

    async def run():
        app = build_app(async_engine)
        async with TestClient(TestServer(app)) as client:
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': ['p one', 'p two'], 'n': 2,
                'max_tokens': 3, 'ignore_eos': True, 'temperature': 0.9,
                'top_p': 0.9})
            body = await r.json()
            assert [c['index'] for c in body['choices']] == [0, 1, 2, 3]
            assert body['usage']['completion_tokens'] == 12
            # prompt_tokens counted once per prompt, not per n
            assert body['usage']['prompt_tokens'] == sum(
                len(async_engine.tokenizer.encode(p))
                for p in ('p one', 'p two'))

            # logprobs=0 still returns chosen-token logprobs
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': 'abc', 'max_tokens': 2,
                'ignore_eos': True, 'logprobs': 0})
            lp = (await r.json())['choices'][0]['logprobs']
            assert lp and len(lp['token_logprobs']) == 2

            # scoring: echo + logprobs + max_tokens=0
            prompt = 'hello world again'
            ids = async_engine.tokenizer.encode(prompt)
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': prompt, 'max_tokens': 0,
                'echo': True, 'logprobs': 1})
            body = await r.json()
            ch = body['choices'][0]
            assert ch['text'] == prompt
            lp = ch['logprobs']
            assert len(lp['tokens']) == len(ids)
            assert lp['token_logprobs'][0] is None
            assert all(isinstance(x, float) and x <= 0.0
                       for x in lp['token_logprobs'][1:])
            assert body['usage']['completion_tokens'] == 0
            # logprobs=N returns N alternatives per scored position (the
            # full distribution is in hand on the prompt-scoring path)
            tops = lp['top_logprobs']
            assert tops is not None and len(tops) == len(ids)
            assert tops[0] is None
            for chosen, alts in zip(lp['token_logprobs'][1:], tops[1:]):
                assert isinstance(alts, dict) and len(alts) == 1
                # the single best alternative can't score below chosen
                assert max(alts.values()) >= chosen - 1e-5

            # echo + generation: alternatives cover the prompt region
            # (host-scored) AND the generated positions (device top-k
            # readback planes)
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': prompt, 'max_tokens': 2,
                'ignore_eos': True, 'echo': True, 'logprobs': 2})
            lp = (await r.json())['choices'][0]['logprobs']
            assert len(lp['top_logprobs']) == len(ids) + 2
            assert all(isinstance(d, dict) and len(d) <= 2
                       for d in lp['top_logprobs'][1:len(ids)])
            for d in lp['top_logprobs'][len(ids):]:
                assert isinstance(d, dict) and 1 <= len(d) <= 2
                assert all(v <= 1e-5 for v in d.values())

            # suffix is rejected loudly
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': 'x', 'suffix': 'y'})
            assert r.status == 400

            # streaming with logprobs carries per-frame logprobs
            r = await client.post('/v1/completions', json={
                'model': 'tiny', 'prompt': 'abc', 'max_tokens': 3,
                'ignore_eos': True, 'logprobs': 1, 'stream': True})
            frames = [json.loads(ln[len('data: '):])
                      for ln in (await r.read()).decode().splitlines()
                      if ln.startswith('data: ') and '[DONE]' not in ln]
            got_lps = [x for f in frames
                       if f['choices'][0]['logprobs']
                       for x in f['choices'][0]['logprobs']['token_logprobs']]
            assert len(got_lps) == 3

    asyncio.run(run())
