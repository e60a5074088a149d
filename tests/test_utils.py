"""Aux subsystem tests: logger env levels, golden-file debug compare,
phase timers (reference aux: logger.cc, llama_utils.cu CmpWrite/CmpRead,
nvtx ranges)."""
import importlib
import os

import numpy as np


def test_logger_env_level(monkeypatch):
    monkeypatch.setenv('LMDEPLOY_TPU_LOG_LEVEL', 'DEBUG')
    import logging

    from lmdeploy_tpu.utils import logger as logmod
    lg = logging.getLogger('lmdeploy_tpu_test_x')
    lg._lmdeploy_tpu_init = False
    got = logmod.get_logger('lmdeploy_tpu_test_x')
    assert got.level == logging.DEBUG


def test_debug_dump_then_cmp(monkeypatch, tmp_path, capsys):
    import jax.numpy as jnp
    monkeypatch.setenv('LMDEPLOY_TPU_DEBUG', 'dump')
    monkeypatch.setenv('LMDEPLOY_TPU_DEBUG_DIR', str(tmp_path))
    from lmdeploy_tpu.utils import debug
    importlib.reload(debug)
    x = jnp.asarray(np.arange(8, dtype=np.float32))
    debug.dbg('t', x)
    import jax
    jax.effects_barrier()
    assert (tmp_path / 't.0.npy').exists()

    monkeypatch.setenv('LMDEPLOY_TPU_DEBUG', 'cmp')
    importlib.reload(debug)
    debug.dbg('t', x)
    jax.effects_barrier()
    out = capsys.readouterr().out
    assert 'OK ' in out and 't:' in out
    debug.reset()
    debug.dbg('t', x + 1.0)
    jax.effects_barrier()
    assert 'DIFF' in capsys.readouterr().out


def test_phase_timer():
    from lmdeploy_tpu.utils.profiler import PhaseTimer
    pt = PhaseTimer()
    with pt.phase('a'):
        pass
    with pt.phase('a'):
        pass
    assert pt.counts['a'] == 2
    assert 'a:' in pt.report()


def test_multihost_single_process():
    """Single-process degenerate path of the multi-host plumbing."""
    from lmdeploy_tpu.parallel.multihost import (broadcast_control,
                                                 make_global_mesh)
    mesh = make_global_mesh(tp=4)
    assert mesh.devices.shape == (2, 4)  # 8 virtual cpu devices
    out = broadcast_control(np.arange(4))
    np.testing.assert_array_equal(out, np.arange(4))


def test_trace_summary_tool(tmp_path):
    """benchmark/trace_summary.py parses a jax.profiler capture and
    attributes device time to op categories (the TPU analogue of the
    reference's nsys/NVTX kernel-time attribution)."""
    import jax
    import jax.numpy as jnp
    import pytest
    pytest.importorskip('tensorflow.tsl.profiler.protobuf.xplane_pb2')

    @jax.jit
    def f(x, w):
        return jax.nn.softmax(jnp.dot(x, w), axis=-1)

    x = jnp.ones((64, 128), jnp.float32)
    w = jnp.ones((128, 128), jnp.float32)
    f(x, w).block_until_ready()
    with jax.profiler.trace(str(tmp_path)):
        f(x, w).block_until_ready()

    import sys
    sys.path.insert(0, 'benchmark')
    try:
        import trace_summary
    finally:
        sys.path.pop(0)
    s = trace_summary.summarize(str(tmp_path), top=10)
    assert s['busy_ms'] > 0
    cats = {c['category'] for c in s['categories']}
    assert 'matmul' in cats
    assert any(o['op'].startswith('dot') for o in s['top_ops'])
