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


def test_cross_host_spmd_engine(tmp_path):
    """A REAL TPUEngine serves over a tp=2 mesh SPANNING a 2-process
    jax.distributed cluster: process 0 runs the scheduler (every device
    dispatch — admission install_slot/prefill included — framed to
    followers via broadcast_control), process 1 replays the frames
    against its device-state replica, and the streamed tokens are
    identical to a single-process tp=2 engine on the same checkpoint."""
    # single-process tp=2 reference (pytest env: 8 virtual cpu devices)
    import jax
    import jax.numpy as jnp

    from lmdeploy_tpu.config import EngineConfig, ModelConfig
    from lmdeploy_tpu.engine.engine import TPUEngine
    from lmdeploy_tpu.messages import GenerationConfig
    from lmdeploy_tpu.models.llama import init_params
    cfg = ModelConfig(head_num=2, kv_head_num=2, size_per_head=16,
                      inter_size=64, num_layer=2, vocab_size=128,
                      rotary_embedding=16, max_position_embeddings=128,
                      session_len=128, end_id=2)
    ecfg = EngineConfig(max_batch_size=2, session_len=64, page_size=8,
                        num_pages=32, max_context_token_num=16,
                        prefill_buckets=(16,), use_pallas=False,
                        step_length=2, tp=2, speculative_k=2)
    params = init_params(cfg, jax.random.PRNGKey(0), jnp.float32)
    ref = TPUEngine(cfg, ecfg, params,
                    start=True)
    try:
        inst = ref.create_instance()
        want = inst.infer(
            1, [3, 9, 4, 9, 4], gen_config=GenerationConfig(
                max_new_tokens=8, top_k=1, ignore_eos=True),
            sequence_end=True).token_ids
        want_sampled = inst.infer(
            2, [5, 7, 5, 7], gen_config=GenerationConfig(
                max_new_tokens=6, top_k=20, top_p=0.9, temperature=0.9,
                random_seed=11, ignore_eos=True),
            sequence_end=True).token_ids
    finally:
        ref.shutdown()

    worker = osp.join(osp.dirname(__file__), '_multihost_engine_worker.py')
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
            out, err = p.communicate(timeout=560)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail('engine worker timed out')
        outs.append((p.returncode, out.decode(), err.decode()))
    for rc, out, err in outs:
        assert rc == 0, f'worker failed rc={rc}\n{out}\n{err}'

    with open(tmp_path / 'engine_worker_0.json') as f:
        leader = json.load(f)
    with open(tmp_path / 'engine_worker_1.json') as f:
        follower = json.load(f)
    # the mesh genuinely spans both processes
    assert leader['mesh_procs'] == [0, 1]
    assert follower['mesh_procs'] == [0, 1]
    assert leader['mesh_shape'] == {'dp': 1, 'tp': 2}
    # tokens streamed on the leader, identical to single-process tp=2
    # — for the greedy+speculative AND the sampled request classes
    assert leader['finished']
    assert leader['token_ids'] == want
    assert leader['sampled_token_ids'] == want_sampled
    assert leader['spec_rounds'] > 0   # spec dispatches crossed hosts
    # the follower replayed real work: admission (install_slot +
    # prefill) and the decode rounds all crossed as frames
    assert follower['frames'] >= 4


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
