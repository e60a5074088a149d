"""bench.py must emit exactly ONE JSON line no matter the chip's mood
(VERDICT r4 item 1: BENCH_r04 was rc=124/parsed=null — the driver killed
a bench run that never got its fallback line out).

These tests run bench.py as a subprocess with the probe faked (no TPU,
no real clients to kill) and assert the line arrives inside the budget.

Reference anchor: the published-numbers discipline of
/root/reference/docs/en/w4a16.md — a benchmark that records nothing is
worse than one that records a labeled stale value.
"""
import json
import os
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), 'bench.py')


def _run(env_extra, timeout):
    env = {**os.environ, 'PALLAS_AXON_POOL_IPS': '',
           'JAX_PLATFORMS': 'cpu', **env_extra}
    t0 = time.monotonic()
    out = subprocess.run([sys.executable, BENCH], capture_output=True,
                         text=True, timeout=timeout, env=env)
    lines = [l for l in out.stdout.splitlines() if l.startswith('{')]
    return lines, time.monotonic() - t0, out


def test_wedged_tunnel_probe_hang_still_emits_json():
    # probe hangs forever; watchdog must print the stale line at the
    # 5 s budget and hard-exit (this is the kill -STOP scenario)
    lines, dt, out = _run({'LMDEPLOY_TPU_BENCH_FAKE_PROBE': 'hang',
                           'LMDEPLOY_TPU_BENCH_BUDGET_S': '5'},
                          timeout=30)
    assert len(lines) == 1, out.stderr[-500:]
    assert dt < 15
    parsed = json.loads(lines[0])
    assert parsed['unit'] == 'tok/s'
    assert parsed['detail']['stale'] is True
    assert out.returncode == 0


def test_dead_chip_emits_stale_immediately():
    lines, dt, out = _run({'LMDEPLOY_TPU_BENCH_FAKE_PROBE': 'dead',
                           'LMDEPLOY_TPU_BENCH_BUDGET_S': '600'},
                          timeout=30)
    assert len(lines) == 1
    assert dt < 15
    parsed = json.loads(lines[0])
    assert parsed['detail']['stale'] is True
    assert 'wedged' in parsed['detail']['note']


def test_leaked_hbm_chip_emits_stale():
    # alive but can't hold the HBM floor: one short grace retry (budget
    # too small for the 120 s grace sleep), then the stale line
    lines, dt, out = _run({'LMDEPLOY_TPU_BENCH_FAKE_PROBE': 'noalloc',
                           'LMDEPLOY_TPU_BENCH_BUDGET_S': '30'},
                          timeout=60)
    assert len(lines) == 1
    parsed = json.loads(lines[0])
    assert parsed['detail']['stale'] is True
    assert 'HBM' in parsed['detail']['note']


def test_deadline_flush_prefers_fresh_partials():
    # if the headline phase landed before the watchdog fired, the
    # deadline line must carry the FRESH number, not the stale fallback
    import importlib.util
    spec = importlib.util.spec_from_file_location('bench_wd', BENCH)
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    bench._PARTIAL['value'] = 123.4
    bench._PARTIAL['detail'] = {'ttft_ms': 50.0}
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._deadline_flush('test')
    parsed = json.loads(buf.getvalue().strip())
    assert parsed['value'] == 123.4
    assert parsed['detail']['deadline_truncated'] == 'test'
    assert parsed['vs_baseline'] == pytest.approx(123.4 / 206.4, abs=1e-3)
    # second flush is a no-op (exactly one line per process)
    buf2 = io.StringIO()
    with redirect_stdout(buf2):
        bench._deadline_flush('again')
    assert buf2.getvalue() == ''
