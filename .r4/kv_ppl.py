"""Proxy Δppl for the dynamic per-token KV-INT4 scheme (CPU; VERDICT r3
weak #5 target: int4 Δppl <= 0.02)."""
import json
import os.path as osp
import sys

sys.path.insert(0, '/root/repo')
from lmdeploy_tpu.utils.platform import force_cpu_platform
force_cpu_platform()

from benchmark.accuracy import ensure_proxy
from benchmark.ppl import run as ppl_run

dst = '/tmp/lmdeploy_tpu_proxy'
ensure_proxy(dst, steps=400)
res = ppl_run(dst, dataset=f'file:{osp.join(dst, "eval.txt")}',
              nsamples=8, seqlen=128,
              configs=['bf16', 'kv_int8', 'kv_int4', 'kv_int4_dyn'],
              group_size=64, oracle=True)
base = res['bf16']
out = {k: {'ppl': round(v, 4), 'delta': round(v - base, 4)}
       for k, v in res.items()}
print(json.dumps({'kv_ppl': out}), flush=True)
