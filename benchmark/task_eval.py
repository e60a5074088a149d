"""lm-eval-style task scoring through the engine's prompt-logits path.

The reference's published accuracy tables (/root/reference/docs/en/
kv_int8.md "Accuracy Test", w4a16.md) come from an external eval stack
(opencompass) scoring multiple-choice tasks by continuation
log-likelihood.  This harness implements that protocol natively on top
of the engine's ``decode()`` (chunked-prefill logits — the same
primitive the /v1/completions ``max_tokens=0 + echo + logprobs`` scoring
path uses), so the day real checkpoints are available the accuracy
table fills itself with one command (VERDICT r4 item 10):

  python -m benchmark.task_eval <hf_model_dir> --tasks file:task.jsonl \
      [--configs bf16,w4a16,kv_int8] [--limit 100] [--json out.json]

Task file: JSON lines, each ``{"ctx": str, "choices": [str, ...],
"gold": int}`` (lm-eval's loglikelihood request shape: every choice is
scored as a continuation of ctx; accuracy = argmax of summed logprob,
acc_norm = argmax of per-token-normalized logprob).  Pre-tokenized
records (``ctx_ids`` / ``choices_ids``) are accepted too, which lets the
harness run in this no-checkpoint environment on random workspaces.

Scoring matches lm-eval's HFLM.loglikelihood: the (ctx + choice) string
is tokenized jointly, the continuation is the token suffix past the
ctx-only tokenization, and its logprob is teacher-forced under ONE
decode() call.  ``is_greedy`` (continuation equals the argmax decode) is
reported per choice like lm-eval's exact-match primitive.
"""
from __future__ import annotations

import json
from typing import Dict, List, Optional, Sequence

import numpy as np


def continuation_logprob(logits: np.ndarray, ids: Sequence[int],
                         ctx_len: int) -> tuple:
    """(sum_logprob, is_greedy) of ids[ctx_len:] under teacher forcing.

    logits: [T, V] where logits[i] predicts ids[i + 1] (the engine
    decode() convention; same layout as benchmark/ppl.py:token_ppl).
    """
    assert 1 <= ctx_len < len(ids)
    lg = logits[ctx_len - 1:len(ids) - 1].astype(np.float64)
    tgt = np.asarray(ids[ctx_len:], np.int64)
    mx = lg.max(axis=-1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(lg - mx).sum(axis=-1))
    lp = lg[np.arange(len(tgt)), tgt] - lse
    return float(lp.sum()), bool((lg.argmax(axis=-1) == tgt).all())


def _tokenize_record(rec: Dict, tok) -> tuple:
    """-> (ctx_ids, [choice_full_ids...]): joint-tokenized like lm-eval."""
    if 'ctx_ids' in rec:
        ctx = list(rec['ctx_ids'])
        return ctx, [ctx + list(c) for c in rec['choices_ids']]
    ctx = tok.encode(rec['ctx'])
    fulls = []
    for choice in rec['choices']:
        full = tok.encode(rec['ctx'] + choice)
        if full[:len(ctx)] != ctx:
            # rare boundary merge: fall back to ctx + choice-only tokens
            full = ctx + tok.encode(choice)
        if len(full) <= len(ctx):      # empty continuation: score a pad
            full = ctx + [tok.encode(choice or ' ')[-1]]
        fulls.append(full)
    return ctx, fulls


def score_records(engine, records: List[Dict], tok=None,
                  max_len: Optional[int] = None) -> Dict:
    """Score multiple-choice records through one engine.

    Returns {n, acc, acc_norm, greedy_rate, details: [...]}.
    """
    inst = engine.create_instance()
    n = acc = accn = greedy = 0
    details = []
    for rec in records:
        ctx, fulls = _tokenize_record(rec, tok)
        lps, lpns, grs = [], [], []
        for full in fulls:
            if max_len:
                drop = max(0, len(full) - max_len)
                full, cl = full[drop:], max(1, len(ctx) - drop)
            else:
                cl = len(ctx)
            logits = inst.decode(full)
            lp, gr = continuation_logprob(np.asarray(logits), full, cl)
            lps.append(lp)
            lpns.append(lp / max(1, len(full) - cl))
            grs.append(gr)
        gold = int(rec['gold'])
        pick, pick_n = int(np.argmax(lps)), int(np.argmax(lpns))
        n += 1
        acc += pick == gold
        accn += pick_n == gold
        greedy += grs[gold]
        details.append({'lps': lps, 'pick': pick, 'gold': gold,
                        'greedy': grs})
    return {'n': n, 'acc': acc / max(n, 1), 'acc_norm': accn / max(n, 1),
            'greedy_rate': greedy / max(n, 1), 'details': details}


def load_task(spec: str, limit: Optional[int] = None) -> List[Dict]:
    """``file:<path.jsonl>`` or ``synthetic`` (self-contained sanity
    task: pick the continuation that repeats the context's pattern)."""
    if spec.startswith('file:'):
        records = []
        with open(spec[5:]) as f:
            for line in f:
                line = line.strip()
                if line:
                    records.append(json.loads(line))
        return records[:limit] if limit else records
    if spec == 'synthetic':
        import random
        rng = random.Random(0)
        records = []
        for _ in range(limit or 32):
            a, b = rng.randrange(5, 120), rng.randrange(5, 120)
            ctx = [a, b] * 6                   # strong bigram pattern
            good = [a, b]
            bad = [rng.randrange(5, 120), rng.randrange(5, 120)]
            gold = rng.randrange(2)
            records.append({
                'ctx_ids': ctx,
                'choices_ids': [good, bad] if gold == 0 else [bad, good],
                'gold': gold})
        return records
    raise ValueError(f'unknown task spec {spec!r} (file:<jsonl>|synthetic)')


def run(model_path: str, tasks: str = 'synthetic',
        configs: Optional[List[str]] = None, limit: Optional[int] = None,
        group_size: int = 128, engine_kw: Optional[Dict] = None) -> Dict:
    """Score one task under several quantization configs (the accuracy
    table's rows) via benchmark/ppl.py's engine builders."""
    from .ppl import build_variant
    records = load_task(tasks, limit)
    need_tok = any('ctx_ids' not in r for r in records)
    tok = None
    if need_tok:
        from lmdeploy_tpu.api import _resolve_tokenizer
        tok = _resolve_tokenizer(model_path, 32000)
    engine_kw = dict(engine_kw or {})
    engine_kw.setdefault('session_len', 2048)
    engine_kw.setdefault('max_context_token_num', 512)
    out = {'tasks': tasks, 'n': len(records)}
    for variant in (configs or ['bf16']):
        eng = build_variant(model_path, variant, group_size, engine_kw)
        try:
            res = score_records(eng, records, tok,
                                max_len=engine_kw['session_len'] - 8)
        finally:
            eng.shutdown()
        res.pop('details')
        out[variant] = res
        print(f'# {variant}: acc={res["acc"]:.4f} '
              f'acc_norm={res["acc_norm"]:.4f} n={res["n"]}')
    return out


def main():
    import argparse
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument('model_path')
    ap.add_argument('--tasks', default='synthetic')
    ap.add_argument('--configs', default='bf16')
    ap.add_argument('--limit', type=int, default=None)
    ap.add_argument('--group-size', type=int, default=128)
    ap.add_argument('--json', default=None)
    args = ap.parse_args()
    res = run(args.model_path, tasks=args.tasks,
              configs=args.configs.split(','), limit=args.limit,
              group_size=args.group_size)
    line = json.dumps(res)
    print(line)
    if args.json:
        with open(args.json, 'w') as f:
            f.write(line)


if __name__ == '__main__':
    main()
