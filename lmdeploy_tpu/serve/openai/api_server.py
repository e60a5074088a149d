"""OpenAI-compatible HTTP server.

Endpoint-parity with the reference FastAPI server (lmdeploy/serve/openai/
api_server.py: /v1/models:41, /v1/chat/completions:75, /v1/embeddings:230,
/generate:253; session id derived from the client host).  Built on aiohttp
(FastAPI/uvicorn are not available in this environment); responses and SSE
stream framing match the OpenAI protocol.
"""
from __future__ import annotations

import json
from http import HTTPStatus
from typing import Optional

from aiohttp import web

from ..async_engine import AsyncEngine
from .protocol import (ChatCompletionRequest, ChatCompletionResponse,
                       ChatCompletionResponseChoice,
                       ChatCompletionResponseStreamChoice,
                       ChatCompletionStreamResponse, ChatMessage,
                       CompletionRequest, CompletionResponse,
                       CompletionResponseChoice,
                       CompletionResponseStreamChoice,
                       CompletionStreamResponse, DeltaMessage,
                       EmbeddingsRequest, EmbeddingsResponse,
                       ErrorResponse, GenerateRequest, GenerateResponse,
                       ModelCard, ModelList, ModelPermission, UsageInfo)


class VariableInterface:
    """Server-global handles (reference: api_server.py:26-30)."""
    async_engine: Optional[AsyncEngine] = None
    request_hosts = []


def _model_name() -> str:
    return VariableInterface.async_engine.engine.cfg.model_name


def _error(status: HTTPStatus, message: str) -> web.Response:
    return web.json_response(
        ErrorResponse(message=message, code=status.value).model_dump(),
        status=status.value)


def _session_id(request: web.Request) -> int:
    """Session id from client host (reference: api_server.py ip2id).

    md5, not hash(): Python's hash() is salted per process, so ids would
    change across server restarts and break interactive continuations."""
    import hashlib
    host = (request.remote or '127.0.0.1') + str(
        request.headers.get('X-Session-Id', ''))
    digest = hashlib.md5(host.encode()).digest()
    return int.from_bytes(digest[:4], 'big') % (2 ** 30)


def _overloaded() -> Optional[web.Response]:
    """Backpressure: map engine queue saturation to HTTP 429."""
    if VariableInterface.async_engine.engine.overloaded():
        return _error(HTTPStatus.TOO_MANY_REQUESTS,
                      'server is overloaded, retry later')
    return None


async def available_models(request: web.Request) -> web.Response:
    cards = [ModelCard(id=_model_name(), root=_model_name(),
                       permission=[ModelPermission()])]
    return web.json_response(ModelList(data=cards).model_dump())


async def _check_model(model: str) -> Optional[web.Response]:
    if model != _model_name():
        return _error(
            HTTPStatus.NOT_FOUND,
            f'The model `{model}` does not exist.')
    return None


async def chat_completions_v1(raw: web.Request) -> web.StreamResponse:
    """POST /v1/chat/completions — streaming SSE or full JSON."""
    try:
        req = ChatCompletionRequest(**await raw.json())
    except Exception as e:  # noqa: BLE001
        return _error(HTTPStatus.BAD_REQUEST, str(e))
    err = await _check_model(req.model) or _overloaded()
    if err:
        return err
    engine = VariableInterface.async_engine
    session_id = _session_id(raw)
    # `stop`: bool interrupts the session (lmdeploy extension); a string
    # or list is the OpenAI stop-strings contract — tokenized into stop
    # sequences (multi-token strings included) by the serving engine
    stop_flag = req.stop if isinstance(req.stop, bool) else False
    stop_strings = None if isinstance(req.stop, bool) else req.stop
    want_lp = bool(req.logprobs)
    # engine readback planes cap at 5 alternatives (OpenAI allows up to
    # 20; values above clip, negatives floor to 0)
    n_top = max(0, min(int(req.top_logprobs or 0), 5)) if want_lp else 0
    gen = engine.generate_openai(
        req.messages, session_id, stream_response=bool(req.stream),
        renew_session=bool(req.renew_session),
        request_output_len=req.max_tokens or 512, stop=stop_flag,
        top_p=req.top_p, top_k=req.top_k if req.top_k is not None else 40,
        temperature=req.temperature,
        repetition_penalty=req.repetition_penalty,
        presence_penalty=req.presence_penalty or 0.0,
        frequency_penalty=req.frequency_penalty or 0.0,
        ignore_eos=bool(req.ignore_eos), stop_strings=stop_strings,
        output_logprobs=want_lp, top_logprobs=n_top)

    def _chat_lp_content(out):
        """OpenAI chat logprobs entries for one GenOut frame."""
        tok = VariableInterface.async_engine.tokenizer
        entries = []
        for i, tid in enumerate(out.token_ids or []):
            piece = tok.decode([int(tid)])
            lp = (out.logprobs[i] if out.logprobs
                  and i < len(out.logprobs) else None)
            entry = {'token': piece, 'logprob': lp,
                     'bytes': list(piece.encode('utf-8'))}
            if n_top:
                tops = (out.top_logprobs[i] if out.top_logprobs
                        and i < len(out.top_logprobs) else {})
                entry['top_logprobs'] = [
                    {'token': tok.decode([int(t)]), 'logprob': float(v),
                     'bytes': list(tok.decode([int(t)]).encode('utf-8'))}
                    for t, v in sorted(tops.items(),
                                       key=lambda kv: -kv[1])]
            entries.append(entry)
        return entries

    model_name = req.model
    if req.stream:
        resp = web.StreamResponse(
            headers={'Content-Type': 'text/event-stream',
                     'Cache-Control': 'no-cache'})
        await resp.prepare(raw)
        first = ChatCompletionStreamResponse(
            model=model_name,
            choices=[ChatCompletionResponseStreamChoice(
                index=0, delta=DeltaMessage(role='assistant'))])
        await resp.write(
            f'data: {first.model_dump_json()}\n\n'.encode())
        finish = None
        async for out in gen:
            finish = out.finish_reason
            chunk = ChatCompletionStreamResponse(
                model=model_name,
                choices=[ChatCompletionResponseStreamChoice(
                    index=0, delta=DeltaMessage(content=out.response),
                    logprobs=({'content': _chat_lp_content(out)}
                              if want_lp and out.token_ids else None),
                    finish_reason=None if finish == 'cancel' else finish)])
            await resp.write(
                f'data: {chunk.model_dump_json()}\n\n'.encode())
        await resp.write(b'data: [DONE]\n\n')
        await resp.write_eof()
        return resp

    text = ''
    tokens = 0
    input_len = 0
    finish = None
    lp_content = []
    async for out in gen:
        text += out.response
        tokens = out.generate_token_len
        input_len = out.input_token_len
        finish = out.finish_reason
        if want_lp and out.token_ids:
            lp_content.extend(_chat_lp_content(out))
    payload = ChatCompletionResponse(
        model=model_name,
        choices=[ChatCompletionResponseChoice(
            index=0, message=ChatMessage(role='assistant', content=text),
            logprobs={'content': lp_content} if want_lp else None,
            finish_reason=None if finish == 'cancel' else finish)],
        usage=UsageInfo(prompt_tokens=input_len, completion_tokens=tokens,
                        total_tokens=input_len + tokens))
    return web.json_response(payload.model_dump())


async def completions_v1(raw: web.Request) -> web.StreamResponse:
    """POST /v1/completions — raw-prompt continuation, no chat template
    (beyond-reference: the reference defines the Completion* protocol
    schemas but never mounts the endpoint).  Supports a single prompt or
    a list (served sequentially, one choice per prompt), `echo`, and
    SSE streaming for a single prompt."""
    try:
        req = CompletionRequest(**await raw.json())
    except Exception as e:  # noqa: BLE001
        return _error(HTTPStatus.BAD_REQUEST, str(e))
    err = await _check_model(req.model) or _overloaded()
    if err:
        return err
    engine = VariableInterface.async_engine
    base_sid = _session_id(raw)
    prompts = [req.prompt] if isinstance(req.prompt, str) else list(req.prompt)
    stop_flag = req.stop if isinstance(req.stop, bool) else False
    stop_strings = None if isinstance(req.stop, bool) else req.stop
    if req.suffix:
        return _error(HTTPStatus.BAD_REQUEST,
                      'suffix is not supported; use the codellama '
                      'infilling chat template for fill-in-the-middle')
    n = req.n or 1

    # logprobs=0 still returns the chosen-token logprobs (OpenAI: the
    # int is the number of ALTERNATIVES).  Prompt-scored positions
    # (echo / max_tokens=0) compute top-N alternatives host-side from
    # the full logits; GENERATED positions ride the engine's device
    # top-k readback planes (GenerationConfig.top_logprobs).
    want_logprobs = req.logprobs is not None
    # OpenAI contract: the logprobs int is the number of ALTERNATIVES
    # per position, capped at 5 (negatives floor to 0: logprobs=-1 must
    # not slice a whole-vocab alternatives dict via argpartition)
    n_alts = max(0, min(int(req.logprobs or 0), 5)) if want_logprobs else 0

    def _gen(prompt: str, sid: int, stream: bool):
        return engine.generate(
            prompt, sid, stream_response=stream, sequence_start=True,
            sequence_end=True, request_output_len=req.max_tokens or 16,
            stop=stop_flag, top_p=req.top_p,
            top_k=req.top_k if req.top_k is not None else 40,
            temperature=req.temperature,
            repetition_penalty=req.repetition_penalty,
            presence_penalty=req.presence_penalty or 0.0,
            frequency_penalty=req.frequency_penalty or 0.0,
            ignore_eos=bool(req.ignore_eos), stop_strings=stop_strings,
            do_preprocess=False, output_logprobs=want_logprobs,
            top_logprobs=n_alts)

    def _top_strs(d):
        """{token_id: lp} -> {token_string: lp}; ascending-lp insert
        order so the BEST logprob wins a duplicated piece key."""
        tok = VariableInterface.async_engine.tokenizer
        return {tok.decode([int(t)]): float(lp)
                for t, lp in sorted(d.items(), key=lambda kv: kv[1])}

    def _logprobs_obj(ids, lps, text_start: int, tops=None):
        """OpenAI completions logprobs.  ``tops`` carries per-position
        top-N alternative dicts — host-computed on prompt-scored
        positions, device top-k readback on generated ones."""
        tok = VariableInterface.async_engine.tokenizer
        pieces, offsets = [], []
        pos = text_start
        for i in range(len(ids)):
            piece = tok.decode(ids[:i + 1], offset=i)
            pieces.append(piece)
            offsets.append(pos)
            pos += len(piece)
        return {'tokens': pieces, 'token_logprobs': list(lps),
                'top_logprobs': list(tops) if tops is not None else None,
                'text_offset': offsets}

    async def _prompt_logprobs(prompt: str):
        """Echo+logprobs: score the prompt through the prompt-logits
        path (the engine's is_return_logits / PPL machinery) — the
        lm-eval loglikelihood pattern (echo=true, max_tokens=0).  First
        token has no conditional logprob (null, like OpenAI).  Returns
        (ids, chosen_logprobs, top_alternatives-or-None)."""
        import asyncio
        import math
        tok = VariableInterface.async_engine.tokenizer
        ids = tok.encode(prompt)
        if not ids:
            return [], [], (None if not n_alts else [])
        inst = engine.engine.create_instance()
        loop = asyncio.get_event_loop()
        logits = await loop.run_in_executor(None, inst.decode, ids)
        import numpy as np
        lg = np.asarray(logits, np.float32)      # [len(ids), vocab]
        lps = [None]
        tops = [None]
        for t in range(1, len(ids)):
            row = lg[t - 1]
            row = row - row.max()
            logz = math.log(np.exp(row).sum())
            lps.append(float(row[ids[t]] - logz))
            if n_alts:
                cand = np.argpartition(row, -n_alts)[-n_alts:]
                # ascending insert order: when two candidate ids decode
                # to the same piece (byte-fallback duplicates), the BEST
                # logprob must win the dict key, not the last-iterated
                cand = cand[np.argsort(row[cand])]
                tops.append({tok.decode([int(c)]): float(row[c] - logz)
                             for c in cand})
            else:
                tops.append(None)
        return ids, lps, (tops if n_alts else None)

    if req.stream:
        if len(prompts) != 1 or n != 1:
            return _error(HTTPStatus.BAD_REQUEST,
                          'streaming supports a single prompt with n=1')
        if req.max_tokens == 0:
            return _error(HTTPStatus.BAD_REQUEST,
                          'max_tokens=0 scoring requests are '
                          'non-streaming')
        resp = web.StreamResponse(
            headers={'Content-Type': 'text/event-stream',
                     'Cache-Control': 'no-cache'})
        await resp.prepare(raw)
        text_pos = 0
        if req.echo:
            head_lp = None
            if want_logprobs:
                # same content as the non-stream path: prompt tokens
                # scored through the prompt-logits machinery
                try:
                    e_ids, e_lps, e_tops = await _prompt_logprobs(prompts[0])
                    head_lp = _logprobs_obj(e_ids, e_lps, 0, e_tops)
                except RuntimeError as e:
                    return _error(HTTPStatus.BAD_REQUEST, str(e))
            head = CompletionStreamResponse(
                model=req.model,
                choices=[CompletionResponseStreamChoice(
                    index=0, text=prompts[0], logprobs=head_lp)])
            await resp.write(
                f'data: {head.model_dump_json()}\n\n'.encode())
            text_pos = len(prompts[0])
        tok = VariableInterface.async_engine.tokenizer
        seen_ids: list = []
        async for out in _gen(prompts[0], base_sid, True):
            finish = out.finish_reason
            lp = None
            if want_logprobs and out.token_ids:
                # incremental: decode only THIS frame's tokens (each
                # against its prefix, like the engine's own detok path)
                pieces, offsets = [], []
                for tid in out.token_ids:
                    seen_ids.append(tid)
                    piece = tok.decode(seen_ids, offset=len(seen_ids) - 1)
                    pieces.append(piece)
                    offsets.append(text_pos)
                    text_pos += len(piece)
                lp = {'tokens': pieces,
                      'token_logprobs': list(out.logprobs or []),
                      'top_logprobs': ([_top_strs(d) for d in
                                        out.top_logprobs]
                                       if n_alts and out.top_logprobs
                                       else None),
                      'text_offset': offsets}
            chunk = CompletionStreamResponse(
                model=req.model,
                choices=[CompletionResponseStreamChoice(
                    index=0, text=out.response, logprobs=lp,
                    finish_reason=None if finish == 'cancel' else finish)])
            await resp.write(
                f'data: {chunk.model_dump_json()}\n\n'.encode())
        await resp.write(b'data: [DONE]\n\n')
        await resp.write_eof()
        return resp

    choices = []
    prompt_tokens = completion_tokens = 0
    for i, prompt in enumerate(prompts):
        echo_ids, echo_lps, echo_tops = ([], [], None)
        if req.echo and want_logprobs:
            try:
                echo_ids, echo_lps, echo_tops = await _prompt_logprobs(prompt)
            except RuntimeError as e:
                # e.g. prompt exceeds session_len: a JSON 400, not a 500
                return _error(HTTPStatus.BAD_REQUEST, str(e))
        for j in range(n):
            sid = (base_sid + 7919 * (i * n + j)) % (2 ** 30)
            text = ''
            finish = None
            all_ids, all_lps = [], []
            if req.max_tokens == 0:
                # pure scoring request (lm-eval loglikelihood: echo=true,
                # logprobs, max_tokens=0) — no generation at all
                if j == 0:
                    prompt_tokens += len(
                        VariableInterface.async_engine.tokenizer.encode(
                            prompt))
                finish = 'length'
                base = prompt if req.echo else ''
                lp = _logprobs_obj(echo_ids, echo_lps, 0, echo_tops) \
                    if want_logprobs else None
                choices.append(CompletionResponseChoice(
                    index=i * n + j, text=base, logprobs=lp,
                    finish_reason=finish))
                continue
            all_tops = []
            async for out in _gen(prompt, sid, False):
                text += out.response
                if j == 0:
                    prompt_tokens += out.input_token_len
                completion_tokens += out.generate_token_len
                finish = out.finish_reason
                if out.token_ids:
                    all_ids.extend(out.token_ids)
                if out.logprobs:
                    all_lps.extend(out.logprobs)
                if out.top_logprobs:
                    all_tops.extend(out.top_logprobs)
            base = prompt if req.echo else ''
            lp = None
            if want_logprobs:
                # echo prepends the PROMPT tokens, scored through the
                # prompt-logits path (lm-eval loglikelihood pattern);
                # text offsets are absolute in the returned text
                tops = None
                if n_alts:
                    gen_tops = [_top_strs(d) for d in all_tops]
                    gen_tops += [None] * (len(all_ids) - len(gen_tops))
                    tops = (echo_tops or []) + gen_tops
                lp = _logprobs_obj(echo_ids + all_ids,
                                   echo_lps + all_lps, 0, tops)
            choices.append(CompletionResponseChoice(
                index=i * n + j, text=base + text, logprobs=lp,
                finish_reason=None if finish == 'cancel' else finish))
    payload = CompletionResponse(
        model=req.model, choices=choices,
        usage=UsageInfo(prompt_tokens=prompt_tokens,
                        completion_tokens=completion_tokens,
                        total_tokens=prompt_tokens + completion_tokens))
    return web.json_response(payload.model_dump())


async def create_embeddings(raw: web.Request) -> web.Response:
    """POST /v1/embeddings — returns token ids like the reference
    (api_server.py:230: 'embeddings' are the prompt token ids)."""
    try:
        req = EmbeddingsRequest(**await raw.json())
    except Exception as e:  # noqa: BLE001
        return _error(HTTPStatus.BAD_REQUEST, str(e))
    engine = VariableInterface.async_engine
    inputs = req.input if isinstance(req.input, list) else [req.input]
    data = []
    total = 0
    for i, text in enumerate(inputs):
        ids = await engine.get_embeddings(text)
        total += len(ids)
        data.append({'object': 'embedding', 'embedding': ids, 'index': i})
    payload = EmbeddingsResponse(
        data=data, model=req.model or _model_name(),
        usage=UsageInfo(prompt_tokens=total, total_tokens=total,
                        completion_tokens=None))
    return web.json_response(payload.model_dump())


async def generate(raw: web.Request) -> web.StreamResponse:
    """POST /generate — the interactive (non-OpenAI) endpoint with explicit
    sequence_start/end/stop session control (reference: api_server.py:253)."""
    try:
        req = GenerateRequest(**await raw.json())
    except Exception as e:  # noqa: BLE001
        return _error(HTTPStatus.BAD_REQUEST, str(e))
    err = _overloaded()
    if err:
        return err
    engine = VariableInterface.async_engine
    session_id = req.instance_id if req.instance_id >= 0 \
        else _session_id(raw)
    gen = engine.generate(
        req.prompt, session_id, stream_response=req.stream,
        sequence_start=req.sequence_start, sequence_end=req.sequence_end,
        request_output_len=req.request_output_len, stop=req.stop,
        top_p=req.top_p, top_k=req.top_k, temperature=req.temperature,
        repetition_penalty=req.repetition_penalty,
        ignore_eos=req.ignore_eos)

    if req.stream:
        resp = web.StreamResponse(
            headers={'Content-Type': 'text/event-stream'})
        await resp.prepare(raw)
        async for out in gen:
            item = GenerateResponse(text=out.response,
                                    tokens=out.generate_token_len,
                                    finish_reason=out.finish_reason)
            await resp.write((item.model_dump_json() + '\n').encode())
        await resp.write_eof()
        return resp

    text = ''
    tokens = 0
    finish = None
    async for out in gen:
        text += out.response
        tokens = out.generate_token_len
        finish = out.finish_reason
    return web.json_response(GenerateResponse(
        text=text, tokens=tokens, finish_reason=finish).model_dump())


async def metrics(request: web.Request) -> web.Response:
    """GET /metrics — Prometheus text exposition of engine counters and
    gauges (tokens/s derivable from lmdeploy_generated_tokens_total).
    Beyond-reference: the reference has no serving metrics (SURVEY §5)."""
    m = VariableInterface.async_engine.engine.metrics()
    counters = {'requests', 'finished', 'canceled', 'errors', 'rejected',
                'timeout', 'generated_tokens'}
    lines = []
    for k, v in sorted(m.items()):
        name = f'lmdeploy_{k}' + ('_total' if k in counters else '')
        lines.append(f'# TYPE {name} '
                     f'{"counter" if k in counters else "gauge"}')
        lines.append(f'{name} {v}')
    return web.Response(text='\n'.join(lines) + '\n',
                        content_type='text/plain')


def build_app(engine: AsyncEngine) -> web.Application:
    VariableInterface.async_engine = engine
    app = web.Application()
    app.router.add_get('/v1/models', available_models)
    app.router.add_post('/v1/chat/completions', chat_completions_v1)
    app.router.add_post('/v1/completions', completions_v1)
    app.router.add_post('/v1/embeddings', create_embeddings)
    app.router.add_post('/generate', generate)
    app.router.add_get('/metrics', metrics)
    return app


def main(model_path: str, server_name: str = '0.0.0.0',
         server_port: int = 23333, instance_num: int = 32, tp: int = 1,
         pp: int = 1, dp: int = 1, **kw):
    """Launch the server (reference: api_server.py:320)."""
    engine = AsyncEngine(model_path, instance_num=instance_num, tp=tp,
                         pp=pp, dp=dp, **kw)
    app = build_app(engine)
    web.run_app(app, host=server_name, port=server_port)


if __name__ == '__main__':
    import argparse
    ap = argparse.ArgumentParser('lmdeploy_tpu api_server')
    ap.add_argument('model_path')
    ap.add_argument('--server-name', default='0.0.0.0')
    ap.add_argument('--server-port', '--port', type=int, default=23333)
    ap.add_argument('--instance-num', type=int, default=32)
    ap.add_argument('--tp', type=int, default=1)
    ap.add_argument('--pp', type=int, default=1,
                    help='pipeline stages (layers sharded over the mesh)')
    ap.add_argument('--dp', type=int, default=1,
                    help='data-parallel engine groups')
    ap.add_argument('--quant-policy', type=int, default=None,
                    choices=(0, 4, 8),
                    help='KV cache: 0 bf16, 4 int8 (calibrated), 8 int4 '
                         '(dynamic per-token scales if no qparams)')
    ap.add_argument('--speculative-k', type=int, default=None,
                    help='prompt-lookup speculative draft length '
                         '(0 disables)')
    args = ap.parse_args()
    main(args.model_path, args.server_name, args.server_port,
         args.instance_num, args.tp, args.pp, args.dp,
         quant_policy=args.quant_policy,
         speculative_k=args.speculative_k)
