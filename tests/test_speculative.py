"""Speculative decoding (prompt-lookup) tests.

Key invariant: the speculative engine must stream EXACTLY the tokens the
normal greedy engine streams — acceleration, never approximation.
Beyond-reference capability (the reference has no speculative decoding).
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

CFG = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16, inter_size=64,
                  num_layer=2, vocab_size=128, rotary_embedding=16,
                  max_position_embeddings=256, session_len=256, end_id=2)

ECFG = EngineConfig(max_batch_size=2, session_len=160, page_size=8,
                    num_pages=64, max_context_token_num=32,
                    prefill_buckets=(16, 32, 64), use_pallas=False,
                    step_length=4)


def test_ngram_propose():
    from lmdeploy_tpu.ops.speculative import ngram_propose
    hist = np.zeros((2, 32), np.int32)
    # slot 0: ... 5 6 7 9 9 | 5 6 7  -> suffix (5,6,7) matched at pos 3,
    # proposal = tokens after the match: 9 9 ...
    hist[0, :8] = [1, 5, 6, 7, 9, 9, 5, 6]
    hist[0, 8] = 7
    # slot 1: no repeat -> zeros
    hist[1, :6] = [1, 2, 3, 4, 5, 6]
    out = np.asarray(ngram_propose(jnp.asarray(hist),
                                   jnp.asarray([9, 6], np.int32),
                                   k=3, ngram=3))
    assert out[0].tolist() == [9, 9, 5]
    assert out[1].tolist() == [0, 0, 0]


def test_greedy_argmax_matches_numpy():
    from lmdeploy_tpu.ops.speculative import greedy_argmax
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 5, 64)).astype(np.float32)
    got = np.asarray(greedy_argmax(jnp.asarray(x)))
    np.testing.assert_array_equal(got, x.argmax(-1))


def _run(ecfg, prompt, sid, max_new=24):
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, ecfg, params)
    try:
        inst = eng.create_instance()
        outs = list(inst.stream_infer(
            sid, prompt, gen_config=GenerationConfig(
                max_new_tokens=max_new, top_k=1, ignore_eos=True),
            sequence_end=True))
        assert outs[-1].finished
        # streaming monotonicity: frames only extend
        for prev, cur in zip(outs, outs[1:]):
            assert cur.token_ids[:len(prev.token_ids)] == prev.token_ids
        return outs[-1].token_ids, dict(eng.stats)
    finally:
        eng.shutdown()


@pytest.mark.parametrize('prompt', [
    [1, 5, 9, 13, 21, 34, 7],                      # arbitrary
    [3, 4, 5, 3, 4, 5, 3, 4, 5, 3, 4],            # repetitive
])
def test_spec_stream_matches_normal(prompt):
    want, _ = _run(ECFG, prompt, 1)
    spec = dataclasses.replace(ECFG, speculative_k=4)
    got, stats = _run(spec, prompt, 2)
    assert got == want
    assert stats['spec_rounds'] > 0
    # adaptive gating may hand low-acceptance stretches to plain rounds
    assert 0 < stats['spec_emitted'] <= len(got)


def test_spec_accepts_on_repetitive_continuation():
    """Greedy decode of a tiny random model falls into cycles; prompt
    lookup must then accept >1 token/round on average."""
    spec = dataclasses.replace(ECFG, speculative_k=4)
    got, stats = _run(spec, [3, 4, 5, 3, 4, 5, 3, 4, 5, 3, 4], 3,
                      max_new=48)
    assert len(got) == 48
    assert stats['spec_emitted'] / stats['spec_rounds'] > 1.2


def test_spec_on_dp_tp_mesh_matches_single_device():
    """The sharded speculative program (shard_map over (dp, tp)) must
    stream the same tokens as the single-device spec engine."""
    spec = dataclasses.replace(ECFG, speculative_k=4)
    want, _ = _run(spec, [3, 4, 5, 3, 4, 5, 3, 4], 5)
    spec_mesh = dataclasses.replace(spec, dp=2, tp=2, max_batch_size=2)
    got, stats = _run(spec_mesh, [3, 4, 5, 3, 4, 5, 3, 4], 6)
    assert got == want
    assert stats['spec_rounds'] > 0


def test_sampled_spec_disabled_falls_back_to_normal_path():
    """With speculative_sampled=False, a non-greedy request must use the
    normal sampling pipeline (spec restricted to greedy) and behave."""
    spec = dataclasses.replace(ECFG, speculative_k=4,
                               speculative_sampled=False)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, spec, params)
    try:
        inst = eng.create_instance()
        out = inst.infer(7, [3, 4, 5], gen_config=GenerationConfig(
            max_new_tokens=6, top_k=20, top_p=0.9, temperature=1.0,
            random_seed=7, ignore_eos=True), sequence_end=True)
        assert len(out.token_ids) == 6
        assert eng.stats['spec_rounds'] == 0  # sampled -> no spec rounds
    finally:
        eng.shutdown()


@pytest.mark.parametrize('gen_kw', [
    {'top_k': 20, 'top_p': 0.9, 'temperature': 1.0},   # candidates mode
    {'top_k': 0, 'temperature': 0.9},                  # full-vocab mode
])
def test_sampled_request_rides_spec_rounds(gen_kw):
    """By default sampled requests ride speculative rounds via exact
    rejection sampling (beyond-reference; the greedy restriction of the
    classic formulation is lifted for deterministic drafts)."""
    spec = dataclasses.replace(ECFG, speculative_k=4)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, spec, params)
    try:
        inst = eng.create_instance()
        out = inst.infer(7, [3, 4, 5, 3, 4, 5], gen_config=GenerationConfig(
            max_new_tokens=12, random_seed=7, ignore_eos=True, **gen_kw),
            sequence_end=True)
        assert len(out.token_ids) == 12
        assert eng.stats['spec_rounds'] > 0
    finally:
        eng.shutdown()


@pytest.mark.parametrize('gen_kw', [
    {'top_k': 20, 'top_p': 0.9, 'temperature': 0.9},   # candidates mode
    {'top_k': 0, 'temperature': 0.9},                  # full-vocab mode
])
def test_sampled_top_logprobs_rides_spec_rounds(gen_kw):
    """A SAMPLED slot with top_logprobs keeps speculation: the rejection
    verify additionally returns the top-N planes WITHOUT perturbing the
    token stream (same seed, spec-with-topn == spec-without-topn — the
    planes are purely observational), and the reported token logprob
    equals its own top_logprobs entry (the pre-filter convention)."""
    prompt = [3, 4, 5, 3, 4, 5]
    gen0 = GenerationConfig(max_new_tokens=10, random_seed=7,
                            ignore_eos=True, **gen_kw)
    gen = dataclasses.replace(gen0, top_logprobs=2)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    spec = dataclasses.replace(ECFG, speculative_k=4)
    eng0 = TPUEngine(CFG, spec, params)
    try:
        out0 = eng0.create_instance().infer(30, prompt, gen_config=gen0,
                                            sequence_end=True)
        assert eng0.stats['spec_rounds'] > 0
    finally:
        eng0.shutdown()
    eng = TPUEngine(CFG, spec, params)
    try:
        out = eng.create_instance().infer(31, prompt, gen_config=gen,
                                          sequence_end=True)
        assert out.token_ids == out0.token_ids
        assert eng.stats['spec_rounds'] > 0
        assert len(out.top_logprobs) == 10
        for tok, lp, tops in zip(out.token_ids, out.logprobs,
                                 out.top_logprobs):
            assert len(tops) == 2
            assert np.isfinite(lp) and lp <= 0.0
            if tok in tops:     # resamples may fall outside the top-2
                assert lp == pytest.approx(tops[tok], abs=1e-4)
    finally:
        eng.shutdown()


def test_spec_adaptive_fallback_on_low_acceptance():
    """When acceptance sits below the engine's break-even, it must fall
    back to plain decode rounds (speculation may never cost more than it
    saves), re-probe after the cooloff, and still produce the exact
    greedy stream.  Forced deterministically by raising the break-even
    threshold above any achievable acceptance (K+1 = 5 < 10)."""
    spec = dataclasses.replace(ECFG, speculative_k=4, step_length=16)
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, spec, params)
    eng.SPEC_MIN_ACCEPT = 10.0  # unreachable -> every probe cools off
    try:
        inst = eng.create_instance()
        gen = GenerationConfig(max_new_tokens=60, top_k=1,
                               ignore_eos=True)
        got = inst.infer(8, prompt, gen_config=gen,
                         sequence_end=True).token_ids
        stats = dict(eng.stats)
    finally:
        eng.shutdown()
    want, _ = _run(dataclasses.replace(ECFG, step_length=16), prompt, 9,
                   max_new=60)
    assert got == want
    assert stats['spec_fallbacks'] > 0         # cooloff engaged
    assert stats['spec_emitted'] < len(got)    # plain rounds did the rest


def test_spec_serves_logprobs_requests():
    """The packed spec rounds carry a per-token logprob plane, so
    output_logprobs requests ride speculation: greedy logprobs are
    exactly 0 (the plain path's convention) with token-identical
    streams; sampled logprobs are finite and <= 0."""
    spec = dataclasses.replace(ECFG, speculative_k=4)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    want, _ = _run(ECFG, [3, 4, 5, 3, 4, 5], 99, max_new=6)
    eng = TPUEngine(CFG, spec, params)
    try:
        inst = eng.create_instance()
        out = inst.infer(11, [3, 4, 5, 3, 4, 5], gen_config=GenerationConfig(
            max_new_tokens=6, top_k=1, ignore_eos=True,
            output_logprobs=True), sequence_end=True)
        assert out.token_ids == want
        assert out.logprobs == [0.0] * 6
        assert eng.stats['spec_rounds'] > 0
        samp = inst.infer(12, [3, 4, 5, 3, 4, 5], gen_config=GenerationConfig(
            max_new_tokens=6, top_k=20, top_p=0.9, temperature=0.9,
            random_seed=3, ignore_eos=True, output_logprobs=True),
            sequence_end=True)
        assert len(samp.logprobs) == len(samp.token_ids) == 6
        assert all(np.isfinite(lp) and lp <= 0.0 for lp in samp.logprobs)
    finally:
        eng.shutdown()


def test_spec_respects_max_new_tokens_and_continuation():
    spec = dataclasses.replace(ECFG, speculative_k=4)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, spec, params)
    try:
        inst = eng.create_instance()
        gen = GenerationConfig(max_new_tokens=7, top_k=1, ignore_eos=True)
        o1 = inst.infer(9, [3, 4, 5, 3, 4, 5, 3, 4], gen_config=gen)
        assert len(o1.token_ids) == 7
        # interactive continuation on the spec engine
        o2 = inst.infer(9, [5, 5], gen_config=gen, sequence_start=False)
        assert len(o2.token_ids) == 7
    finally:
        eng.shutdown()


def test_spec_logit_transforms_stay_token_identical():
    """Greedy requests using repetition/presence penalty, bad words or
    min_new_tokens ride the rejection-sampling verify ('candidates'
    mode), which applies the full logit pipeline per verify position —
    token streams must equal the spec-disabled engine's EXACTLY, and
    speculation must actually engage."""
    spec = dataclasses.replace(ECFG, speculative_k=4)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    for kw in ({'repetition_penalty': 1.3},
               {'presence_penalty': 0.4},
               {'bad_words': [5]},
               {'min_new_tokens': 6}):
        want_eng = TPUEngine(CFG, ECFG, params)
        got_eng = TPUEngine(CFG, spec, params)
        try:
            gen = GenerationConfig(max_new_tokens=10, top_k=1,
                                   ignore_eos=True, **kw)
            want = want_eng.create_instance().infer(
                1, [3, 4, 5, 3, 4, 5], gen_config=gen,
                sequence_end=True).token_ids
            got = got_eng.create_instance().infer(
                1, [3, 4, 5, 3, 4, 5], gen_config=gen,
                sequence_end=True).token_ids
            assert got == want, kw
            assert got_eng.stats['spec_rounds'] > 0, kw
        finally:
            want_eng.shutdown()
            got_eng.shutdown()


def test_spec_transforms_excluded_when_sampled_spec_off():
    """speculative_sampled=False restores the strict greedy-only gate:
    penalized requests take the plain path."""
    spec = dataclasses.replace(ECFG, speculative_k=4,
                               speculative_sampled=False)
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng = TPUEngine(CFG, spec, params)
    try:
        out = eng.create_instance().infer(
            1, [3, 4, 5, 3, 4, 5], gen_config=GenerationConfig(
                max_new_tokens=8, top_k=1, ignore_eos=True,
                repetition_penalty=1.3), sequence_end=True)
        assert len(out.token_ids) == 8
        assert eng.stats['spec_rounds'] == 0
    finally:
        eng.shutdown()


def test_spec_verify_sample_marginal_is_exact():
    """The rejection-sampling verify must emit EXACTLY the plain-path
    processed distribution at every position (speculation accelerates,
    never approximates).  Checks the position-0 marginal, the acceptance
    probability, and the position-1 marginal conditioned on acceptance
    (whose penalty seen-set must include the accepted draft) against the
    full-vocab oracle pipeline, over 8192 independent keys."""
    from lmdeploy_tpu.ops.sampling import (SamplingState,
                                           apply_repetition_penalty,
                                           top_k_mask, top_p_mask)
    from lmdeploy_tpu.ops.speculative import spec_verify_sample

    rng = np.random.default_rng(0)
    B, K, V = 2, 2, 64
    logits = jnp.asarray(rng.normal(size=(B, K + 1, V)) * 2.0, jnp.float32)
    draft = jnp.asarray([[3, 7], [10, 11]], jnp.int32)
    smp = SamplingState.init(B, eos_id=1)
    smp = dataclasses.replace(
        smp,
        top_k=jnp.asarray([8, 0], jnp.int32),        # slot1: full vocab
        top_p=jnp.asarray([0.85, 1.0], jnp.float32),
        temperature=jnp.asarray([0.7, 1.0], jnp.float32),
        repetition_penalty=jnp.asarray([1.0, 1.4], jnp.float32),
        presence_penalty=jnp.asarray([0.6, 0.0], jnp.float32),
        frequency_penalty=jnp.asarray([0.0, 0.5], jnp.float32))
    hist = jnp.asarray(rng.integers(0, V, (B, 24)), jnp.int32)
    hl = jnp.asarray([10, 12], jnp.int32)
    gen = jnp.asarray([4, 6], jnp.int32)

    def oracle(pos, hist_o, hl_o):
        lg = logits[:, pos].astype(jnp.float32)
        # presence/frequency count generated tokens only; hl - gen is
        # position-invariant (draft positions extend both in lockstep)
        lg = apply_repetition_penalty(lg, hist_o, hl_o,
                                      smp.repetition_penalty,
                                      smp.presence_penalty,
                                      smp.frequency_penalty,
                                      gen_start=hl - gen)
        lg = lg / smp.temperature[:, None]
        lg = top_k_mask(lg, smp.top_k)
        lg = top_p_mask(lg, smp.top_p)
        return np.asarray(jax.nn.softmax(lg, axis=-1), np.float64)

    p0 = oracle(0, hist, hl)
    # position-1 context: history + the accepted draft[:, 0]
    hist1 = hist.at[jnp.arange(B), hl].set(draft[:, 0])
    p1 = oracle(1, hist1, hl + 1)

    fn = jax.jit(lambda keys: spec_verify_sample(
        logits, draft, smp, hist, hl, gen, keys))
    keys = jax.random.split(jax.random.PRNGKey(42), (8192, B))
    g, accept, logp = jax.vmap(fn)(keys)
    g, accept, logp = np.asarray(g), np.asarray(accept), np.asarray(logp)
    # emitted-token logprob == log p0 of that token (plain-path semantics)
    for b in range(B):
        np.testing.assert_allclose(
            np.exp(logp[:100, b, 0]), p0[b, g[:100, b, 0]], rtol=2e-3)

    for b in range(B):
        emp0 = np.bincount(g[:, b, 0], minlength=V) / g.shape[0]
        assert 0.5 * np.abs(emp0 - p0[b]).sum() < 0.06, b
        # acceptance prob == p0(draft)
        assert abs(accept[:, b, 0].mean() - p0[b, draft[b, 0]]) < 0.03, b
        # conditional position-1 marginal given acceptance at 0
        sel = g[accept[:, b, 0], b, 1]
        if sel.size > 500:
            emp1 = np.bincount(sel, minlength=V) / sel.size
            assert 0.5 * np.abs(emp1 - p1[b]).sum() < 0.08, b


def test_spec_verify_sample_greedy_degenerates_to_argmax():
    """top_k==1 slots under the rejection-sampling verify must behave
    exactly like the greedy match-or-correct rule, deterministically."""
    from lmdeploy_tpu.ops.sampling import SamplingState
    from lmdeploy_tpu.ops.speculative import spec_verify_sample

    rng = np.random.default_rng(1)
    B, K, V = 2, 2, 64
    logits = jnp.asarray(rng.normal(size=(B, K + 1, V)), jnp.float32)
    am = np.asarray(logits).argmax(-1)                 # [B, K+1]
    # slot0 draft matches the argmax chain; slot1 diverges at 0
    draft = jnp.asarray([[am[0, 0], am[0, 1]],
                         [(am[1, 0] + 1) % V, am[1, 1]]], jnp.int32)
    smp = SamplingState.init(B, eos_id=1)
    smp = dataclasses.replace(smp, top_k=jnp.ones((B,), jnp.int32))
    hist = jnp.zeros((B, 16), jnp.int32)
    hl = jnp.asarray([4, 4], jnp.int32)
    gen = jnp.asarray([2, 2], jnp.int32)

    keys = jax.random.split(jax.random.PRNGKey(7), (32, B))
    g, accept, logp = jax.vmap(lambda kk: spec_verify_sample(
        logits, draft, smp, hist, hl, gen, kk))(keys)
    g, accept, logp = np.asarray(g), np.asarray(accept), np.asarray(logp)
    assert (g == am[None]).all()                      # always argmax
    assert accept[:, 0].all()                         # matching drafts
    assert not accept[:, 1, 0].any()                  # diverging draft
    assert (logp == 0.0).all()                        # top_k==1 -> log 1


def test_ngram_cascade_falls_back_to_shorter_match():
    """Longest-match-first cascade: a slot with only a 2-gram match gets
    a draft when ngram_min=2, none at fixed ngram=3; a slot with both
    prefers the 3-gram match."""
    from lmdeploy_tpu.ops.speculative import ngram_propose
    hist = np.zeros((2, 32), np.int32)
    # slot 0: suffix (8, 9); (8,9) seen earlier followed by 5 5; the
    # 3-gram suffix (7, 8, 9)... make sure no 3-gram match: earlier
    # context before (8,9) is 1, suffix context is 7.
    hist[0, :9] = [1, 8, 9, 5, 5, 2, 7, 8, 9]
    # slot 1: full 3-gram repeat (5, 6, 7) -> followed by 9 8
    hist[1, :11] = [5, 6, 7, 9, 8, 1, 1, 2, 5, 6, 7]
    hl = np.asarray([9, 11], np.int32)
    fixed = np.asarray(ngram_propose(jnp.asarray(hist), jnp.asarray(hl),
                                     k=2, ngram=3))
    assert fixed[0].tolist() == [0, 0]          # no 3-gram match
    assert fixed[1].tolist() == [9, 8]
    casc = np.asarray(ngram_propose(jnp.asarray(hist), jnp.asarray(hl),
                                    k=2, ngram=3, ngram_min=2))
    assert casc[0].tolist() == [5, 5]           # 2-gram fallback fired
    assert casc[1].tolist() == [9, 8]           # 3-gram still preferred


def test_top_logprobs_rides_spec_rounds():
    """A slot requesting top_logprobs KEEPS speculation (the packed
    spec rounds carry the top-N planes) and still streams
    token-identical greedy output WITH alternatives attached whose
    values match the plain path's."""
    prompt = [3, 4, 5, 3, 4, 5, 3, 4]
    params = init_params(CFG, jax.random.PRNGKey(4), jnp.float32)
    eng0 = TPUEngine(CFG, ECFG, params)
    try:
        out0 = eng0.create_instance().infer(
            21, prompt, gen_config=GenerationConfig(
                max_new_tokens=24, top_k=1, ignore_eos=True,
                top_logprobs=2),
            sequence_end=True)
    finally:
        eng0.shutdown()
    spec = dataclasses.replace(ECFG, speculative_k=4)
    eng = TPUEngine(CFG, spec, params)
    try:
        inst = eng.create_instance()
        out = inst.infer(22, prompt,
                         gen_config=GenerationConfig(
                             max_new_tokens=24, top_k=1, ignore_eos=True,
                             top_logprobs=2),
                         sequence_end=True)
        assert out.token_ids == out0.token_ids
        assert len(out.top_logprobs) == 24
        assert all(len(t) == 2 for t in out.top_logprobs)
        # spec rounds actually served this slot
        assert eng.stats['spec_rounds'] > 0
        # OpenAI consistency: the reported token logprob equals the
        # chosen token's own top_logprobs entry
        for tok, lp, tops in zip(out.token_ids, out.logprobs,
                                 out.top_logprobs):
            assert tok in tops
            assert lp == pytest.approx(tops[tok], abs=1e-5)
        # plane values match the plain path's (same distribution)
        for a, b in zip(out.top_logprobs, out0.top_logprobs):
            assert set(a) == set(b)
            for t in a:
                assert a[t] == pytest.approx(b[t], abs=2e-3)
    finally:
        eng.shutdown()
