"""Fold the spec_overhead:* cell JSONs into the attribution verdict.

  sampling-pipeline cost = sampled_k4 - greedy_k4      (ms/round)
  draft-build (ngram)    = greedy_k4  - nodraft_k4
  (K+1)-row fwd extra    = nodraft_k4 - plain step
  verify-row slope       = fit over greedy_k{1,2,4}
Prints ONE JSON line.
"""
import glob
import json
import os.path as osp

R5 = osp.dirname(osp.abspath(__file__))


def main():
    cells = {}
    for p in glob.glob(osp.join(R5, 'spec_overhead:*.json')):
        name = osp.basename(p)[len('spec_overhead:'):-len('.json')]
        try:
            with open(p) as f:
                cells[name] = json.load(f)
        except (OSError, ValueError):
            pass
    out = {'cells': {k: {kk: v[kk] for kk in
                         ('ms_per_round', 'ms_per_token',
                          'accept_per_round', 'tok_s') if kk in v}
                     for k, v in cells.items() if 'error' not in v}}

    def mr(name):
        c = cells.get(name) or {}
        return c.get('ms_per_round')

    def mt(name):
        c = cells.get(name) or {}
        return c.get('ms_per_token')

    plain, g4, s4, nd4 = mt('plain'), mr('greedy_k4'), \
        mr('sampled_k4'), mr('nodraft_k4')
    if g4 and s4:
        out['sampling_pipeline_ms'] = round(s4 - g4, 3)
    if g4 and nd4:
        out['ngram_draft_ms'] = round(g4 - nd4, 3)
    if nd4 and plain:
        out['kp1_row_fwd_extra_ms'] = round(nd4 - plain, 3)
    g1, g2 = mr('greedy_k1'), mr('greedy_k2')
    if g1 and g2 and g4:
        # rows = k+1: 2, 3, 5 -> least-squares slope ms per verify row
        import numpy as np
        rows = np.array([2.0, 3.0, 5.0])
        ys = np.array([g1, g2, g4])
        a, b = np.polyfit(rows, ys, 1)
        out['ms_per_verify_row'] = round(float(a), 3)
        out['round_fixed_ms'] = round(float(b), 3)
    if g4 and cells.get('greedy_k4', {}).get('accept_per_round'):
        acc = cells['greedy_k4']['accept_per_round']
        out['implied_spec_tok_s_now'] = round(acc / g4 * 1e3, 1)
    print(json.dumps(out), flush=True)


if __name__ == '__main__':
    main()
