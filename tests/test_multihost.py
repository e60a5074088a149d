"""Multi-host plumbing tests.

The reference never tests multi-node at all (SURVEY.md §4: torchrun
single-node test only, "multi-node is never tested without a real
cluster").  Here a REAL 2-process jax.distributed cluster runs on CPU:
coordinator handshake, control broadcast over the distributed KV store,
global-mesh construction and one cross-process jitted collective.
"""
import json
import os
import os.path as osp
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('localhost', 0))
        return s.getsockname()[1]


def test_two_process_jax_distributed(tmp_path):
    worker = osp.join(osp.dirname(__file__), '_multihost_worker.py')
    port = _free_port()
    env = {k: v for k, v in os.environ.items()
           if k not in ('XLA_FLAGS', 'JAX_PLATFORMS')}
    env['JAX_PLATFORMS'] = 'cpu'
    repo = osp.dirname(osp.dirname(osp.abspath(__file__)))
    env['PYTHONPATH'] = repo + os.pathsep + env.get('PYTHONPATH', '')
    procs = [subprocess.Popen(
        [sys.executable, worker, str(pid), '2', str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE)
        for pid in range(2)]
    outs = []
    for p in procs:
        try:
            # generous: 2 jax processes + the pytest parent share 1 core
            out, err = p.communicate(timeout=500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('multihost worker timed out')
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f'worker failed rc={rc}\n{out}\n{err}'

    results = {}
    for pid in range(2):
        with open(tmp_path / f'worker_{pid}.json') as f:
            results[pid] = json.load(f)
    for pid, r in results.items():
        assert r['process_index'] == pid
        assert r['process_count'] == 2
        assert r['device_count'] == 2          # 1 CPU device per process
        assert r['mesh_shape'] == {'dp': 2, 'tp': 1}
        # host 0's control payload reached every host
        assert r['bcast'] == [7, 8, 9, 10]
        # cross-host reduction over the dp-sharded array: 1*4 + 2*4
        assert r['sum'] == 12.0
