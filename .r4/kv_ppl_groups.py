"""Proxy Δppl for dynamic KV-INT4 at G in {1,2,4} feature groups
(VERDICT r3 weak #5 target: int4 Δppl <= 0.02)."""
import json
import os
import os.path as osp
import sys

sys.path.insert(0, '/root/repo')
from lmdeploy_tpu.utils.platform import force_cpu_platform
force_cpu_platform()

from benchmark.accuracy import ensure_proxy
from benchmark.ppl import run as ppl_run

dst = '/tmp/lmdeploy_tpu_proxy'
ensure_proxy(dst, steps=400)
out = {}
base = None
for g in (1, 2, 4):
    os.environ['LMDEPLOY_TPU_KV_DYN_GROUPS'] = str(g)
    cfgs = ['bf16', 'kv_int4_dyn'] if base is None else ['kv_int4_dyn']
    res = ppl_run(dst, dataset=f'file:{osp.join(dst, "eval.txt")}',
                  nsamples=8, seqlen=128, configs=cfgs,
                  group_size=64, oracle=(base is None))
    if base is None:
        base = res['bf16']
        out['bf16'] = {'ppl': round(base, 4)}
    v = res['kv_int4_dyn']
    out[f'kv_int4_dyn_g{g}'] = {'ppl': round(v, 4),
                                'delta': round(v - base, 4)}
    print(json.dumps({'partial': out}), flush=True)
print(json.dumps({'kv_ppl_groups': out}), flush=True)
