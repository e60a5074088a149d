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


__all__ = ['init_multihost', 'make_global_mesh', 'broadcast_control',
           'sync_hosts']
