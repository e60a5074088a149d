"""Multi-host serving: jax.distributed plumbing + rank-0 scheduling.

The reference is single-node (multi-node exists only via MPI in the C++
example, SURVEY.md §2.3); this module is the TPU-native scale-out the
reference never built.  Design:

- every host runs the SAME SPMD step programs over a global mesh
  ``(dp=hosts, tp=local_devices)`` — TP collectives ride ICI within a
  host/slice, dp groups are independent continuous batches so NO decode
  traffic crosses DCN;
- host 0 owns request admission for its dp group only; other hosts run
  their own TPUEngine and their own HTTP frontend (a load balancer
  spreads sessions), OR — for a single logical endpoint — host 0 routes
  EngineRequests to peers over DCN with ``broadcast_one_to_all`` used
  only for engine-wide control (shutdown, flush);
- per-step batch-control metadata never crosses hosts: the dp-sharded
  decode program (parallel/tp.py dp_shard_batch) keeps every group's
  slots, pages and sampling state host-local (pool-local page ids).

The engine half is real: ``TPUEngine`` honors ``EngineConfig.dp`` —
per-group page pools (pool-local ids), per-group schedulers/admission,
group-routed prefill — over the (dp, tp) mesh from
:func:`lmdeploy_tpu.parallel.tp.make_mesh` (host-major device order, so
each dp row is one host).  This module's plumbing is exercised by a REAL
2-process jax.distributed cluster in tests/test_multihost.py
(coordinator handshake, control broadcast, cross-host collective); on a
pod the same code paths run over DCN.
"""
from __future__ import annotations

import os
from typing import Optional

import numpy as np


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> int:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID or the
    TPU pod metadata).  Returns this host's process index."""
    import jax
    kw = {}
    if coordinator_address or os.environ.get('JAX_COORDINATOR_ADDRESS'):
        kw = dict(
            coordinator_address=coordinator_address
            or os.environ['JAX_COORDINATOR_ADDRESS'],
            num_processes=num_processes
            or int(os.environ.get('JAX_NUM_PROCESSES', '1')),
            process_id=process_id
            or int(os.environ.get('JAX_PROCESS_ID', '0')))
    jax.distributed.initialize(**kw)
    return jax.process_index()


def make_global_mesh(tp: Optional[int] = None):
    """(dp=hosts, tp=devices-per-host) mesh over the full pod slice.

    tp defaults to the local device count so TP stays on-host ICI; dp
    spans hosts (independent batches, no cross-host decode collectives).
    """
    import jax
    from .tp import make_mesh
    local = jax.local_device_count()
    tp = tp or local
    assert tp <= local, 'tp must not cross hosts (ICI-only collectives)'
    total = jax.device_count()
    dp = total // tp
    # order devices host-major so each dp row is one host's devices
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    return make_mesh(tp, dp, devices=devs)


def broadcast_control(payload: np.ndarray) -> np.ndarray:
    """Broadcast small engine-control arrays from host 0 to all hosts
    over DCN (admission barriers, shutdown flags)."""
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.broadcast_one_to_all(payload))


def sync_hosts(name: str = 'engine-barrier') -> None:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices(name)


# ---------------------------------------------------------------------------
# Cross-host SPMD engine: rank-0 scheduling, follower dispatch replay
# ---------------------------------------------------------------------------
#
# On TPU pods ICI spans hosts, so the natural way to serve a model too
# big for one host is a tp (or pp) mesh ACROSS processes.  jax is
# multi-controller: every process must issue the SAME jitted calls in
# the SAME order.  The engine's scheduler is dynamic (admission timing,
# readback-driven retirement), so host 0 runs the REAL scheduler and
# every device dispatch it makes is serialized as a control frame that
# follower hosts replay verbatim against their own replica of the
# (params, cache, state) device tree — which stays bit-identical because
# both sides start from the same checkpoint and execute the same
# deterministic program sequence.  Frames ride broadcast_control, so the
# admission path (install_slot / prefill frames) literally crosses hosts
# through it.  The reference has nothing comparable (single-node only,
# SURVEY.md §2.3); design per the scaling-book multi-controller recipe.

_FRAME_CHUNK = 1 << 15          # bytes per broadcast_control payload


class FrameChannel:
    """Ordered host-0 -> all-hosts control-frame channel built on
    broadcast_control.  Each frame is (length int64) + fixed-size uint8
    chunks, so the collective shapes form a tiny static program menu.
    COLLECTIVE: every host must pump send()/recv() in matching order —
    exactly what the follower replay loop does."""

    def send(self, obj) -> None:
        import pickle
        buf = np.frombuffer(pickle.dumps(obj), np.uint8)
        broadcast_control(np.array([len(buf)], np.int64))
        for i in range(0, len(buf), _FRAME_CHUNK):
            chunk = np.zeros(_FRAME_CHUNK, np.uint8)
            part = buf[i:i + _FRAME_CHUNK]
            chunk[:len(part)] = part
            broadcast_control(chunk)

    def recv(self):
        import pickle
        n = int(broadcast_control(np.zeros(1, np.int64))[0])
        parts = [broadcast_control(np.zeros(_FRAME_CHUNK, np.uint8))
                 for _ in range(-(-n // _FRAME_CHUNK))]
        buf = np.concatenate(parts)[:n] if parts else np.zeros(0, np.uint8)
        return pickle.loads(buf.tobytes())


# Per dispatch method: which leading args are the engine's device state
# (P=params, C=cache, S=state) and which outputs update it (None =
# host-readback output the follower discards).  Mirrors every
# engine.py `self.fns.X(...)` call site.
_DEV_IN = {
    'decode_step': 'PCS', 'decode_steps': 'PCS',
    'decode_rounds': 'PCS', 'decode_rounds_sampled': 'PCS',
    'spec_decode_rounds': 'PCS',
    'prefill_chunk': 'PCS', 'prefill_chunks': 'PCS',
    'prefill_logits_row': 'PC',
    'install_slot': 'S', 'clear_slot': 'S', 'set_finished': 'S',
    'set_active': 'S', 'set_page_row': 'S',
}
_DEV_OUT = {
    'decode_step': ('C', 'S', None, None, None),
    'decode_steps': ('C', 'S', None, None),
    'decode_rounds': ('C', 'S', None),
    'decode_rounds_sampled': ('C', 'S', None),
    'spec_decode_rounds': ('C', 'S', None),
    'prefill_chunk': ('C', None), 'prefill_chunks': ('C', None),
    'prefill_logits_row': ('C', None),
    'install_slot': ('S',), 'clear_slot': ('S',), 'set_finished': ('S',),
    'set_active': ('S',), 'set_page_row': ('S',),
}

_STOP = '__stop__'


class _RecordingFns:
    """Wraps an engine's compiled step-fns: every dispatch is framed to
    the followers BEFORE the leader issues it, so all processes hit the
    collective in lockstep.  Only the engine thread calls these
    (engine.py runs every device dispatch on it), so frame order is the
    dispatch order."""

    def __init__(self, inner, channel: FrameChannel):
        self._inner = inner
        self._channel = channel

    def __getattr__(self, name):
        inner = getattr(self._inner, name)
        ndev = len(_DEV_IN.get(name, ''))
        if not ndev or not callable(inner):
            return inner

        def call(*args, **kwargs):
            self._channel.send((name, args[ndev:], kwargs))
            return inner(*args, **kwargs)
        return call


def serve_leader(engine, channel: Optional[FrameChannel] = None):
    """Turn a (not-yet-started) TPUEngine into the rank-0 scheduler of a
    cross-host SPMD engine: wrap its dispatches in control frames, then
    start its scheduler thread.  Returns the channel (pass it to
    stop_followers on shutdown)."""
    channel = channel or FrameChannel()
    engine.fns = _RecordingFns(engine.fns, channel)
    engine.start()
    return channel


def stop_followers(channel: FrameChannel) -> None:
    """Release the follower replay loops.  Call AFTER engine.shutdown()
    on the leader — the scheduler thread keeps dispatching (retire /
    clear_slot / trailing rounds) after a client's infer() returns, and
    every dispatch needs followers still pumping frames."""
    channel.send((_STOP,))


def serve_follower(engine, channel: Optional[FrameChannel] = None) -> int:
    """Replay the leader's dispatch frames against this host's replica
    of the engine's device state.  ``engine`` must be constructed with
    ``start=False`` (no local scheduler).  Blocks until the leader sends
    the stop frame; returns the number of frames replayed."""
    channel = channel or FrameChannel()
    n = 0
    while True:
        frame = channel.recv()
        if frame[0] == _STOP:
            return n
        name, args, kwargs = frame
        dev = {'P': engine.params, 'C': engine.cache, 'S': engine.state}
        out = getattr(engine.fns, name)(
            *[dev[c] for c in _DEV_IN[name]], *args, **kwargs)
        if not isinstance(out, tuple):
            out = (out,)
        for slot, val in zip(_DEV_OUT[name], out):
            if slot == 'C':
                engine.cache = val
            elif slot == 'S':
                engine.state = val
        n += 1


__all__ = ['init_multihost', 'make_global_mesh', 'broadcast_control',
           'sync_hosts', 'FrameChannel', 'serve_leader', 'serve_follower',
           'stop_followers']
