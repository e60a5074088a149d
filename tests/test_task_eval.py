"""lm-eval-style task scoring harness (benchmark/task_eval.py).

Parity target: the loglikelihood protocol of the external eval stacks
behind the reference's accuracy tables (docs/en/kv_int8.md "Accuracy
Test") — continuation logprob under teacher forcing, acc / acc_norm by
argmax, cross-checked here against a torch-eager oracle.
"""
import os.path as osp
import sys

import numpy as np
import pytest

torch = pytest.importorskip('torch')

sys.path.insert(0, osp.join(osp.dirname(__file__), '..'))


@pytest.fixture(scope='module')
def tiny_hf_llama(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM
    cfg = LlamaConfig(hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=4, vocab_size=256,
                      max_position_embeddings=128,
                      tie_word_embeddings=False)
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    d = tmp_path_factory.mktemp('hf_tiny_task')
    model.save_pretrained(d)
    return str(d), model


def test_continuation_logprob_math():
    from benchmark.task_eval import continuation_logprob
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(7, 16)).astype(np.float32)
    ids = [3, 1, 4, 1, 5, 9, 2, 6]
    lp, greedy = continuation_logprob(logits, ids, ctx_len=3)
    want = 0.0
    for i in range(3, len(ids)):
        row = logits[i - 1].astype(np.float64)
        want += row[ids[i]] - np.log(np.exp(row - row.max()).sum()) \
            - row.max()
    assert lp == pytest.approx(want, rel=1e-9)
    assert greedy == all(int(logits[i - 1].argmax()) == ids[i]
                         for i in range(3, len(ids)))


def test_task_eval_matches_torch_oracle(tiny_hf_llama):
    """bf16 engine loglikelihoods equal the torch-eager model's (the
    engine's decode() path is the scoring primitive)."""
    from benchmark.ppl import build_variant
    from benchmark.task_eval import score_records

    path, model = tiny_hf_llama
    rng = np.random.default_rng(1)
    records = []
    for _ in range(3):
        ctx = rng.integers(5, 250, size=12).tolist()
        choices = [rng.integers(5, 250, size=4).tolist() for _ in range(3)]
        records.append({'ctx_ids': ctx, 'choices_ids': choices,
                        'gold': int(rng.integers(0, 3))})

    engine_kw = dict(max_batch_size=2, page_size=8, num_pages=64,
                     prefill_buckets=(32,), use_pallas=False,
                     step_length=2, session_len=120,
                     max_context_token_num=64)
    eng = build_variant(path, 'bf16', 16, engine_kw)
    try:
        res = score_records(eng, records)
    finally:
        eng.shutdown()

    # torch oracle: joint forward, continuation log-softmax sum
    for rec, det in zip(records, res['details']):
        for ci, cont in enumerate(rec['choices_ids']):
            ids = rec['ctx_ids'] + cont
            with torch.no_grad():
                lg = model(torch.as_tensor(ids)[None]).logits[0]
            lsm = torch.log_softmax(lg.double(), dim=-1).numpy()
            cl = len(rec['ctx_ids'])
            want = sum(lsm[i - 1, ids[i]] for i in range(cl, len(ids)))
            assert det['lps'][ci] == pytest.approx(want, abs=2e-2)
        assert det['pick'] == int(np.argmax(det['lps']))
    assert set(res) >= {'n', 'acc', 'acc_norm', 'greedy_rate', 'details'}
    assert res['n'] == 3


def test_task_eval_synthetic_run(tiny_hf_llama):
    """run() end-to-end on the synthetic task: schema + determinism
    (same scores on a repeat run — decode() is a pure function)."""
    from benchmark.task_eval import load_task, run

    path, _ = tiny_hf_llama
    engine_kw = dict(max_batch_size=2, page_size=8, num_pages=64,
                     prefill_buckets=(32,), use_pallas=False,
                     step_length=2, session_len=120,
                     max_context_token_num=64)
    out = run(path, tasks='synthetic', configs=['bf16'], limit=4,
              engine_kw=engine_kw)
    assert out['n'] == 4
    assert 0.0 <= out['bf16']['acc'] <= 1.0
    assert 0.0 <= out['bf16']['acc_norm'] <= 1.0
    out2 = run(path, tasks='synthetic', configs=['bf16'], limit=4,
               engine_kw=engine_kw)
    assert out2['bf16'] == out['bf16']
    # the task loader is deterministic too
    a = load_task('synthetic', 4)
    b = load_task('synthetic', 4)
    assert a == b


def test_task_eval_file_loader(tmp_path):
    from benchmark.task_eval import load_task
    p = tmp_path / 'task.jsonl'
    p.write_text('{"ctx": "a", "choices": ["x", "y"], "gold": 1}\n\n'
                 '{"ctx_ids": [1, 2], "choices_ids": [[3], [4]], '
                 '"gold": 0}\n')
    recs = load_task(f'file:{p}')
    assert len(recs) == 2
    assert recs[0]['gold'] == 1
    assert load_task(f'file:{p}', 1) == recs[:1]
