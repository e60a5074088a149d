"""Worker for the 2-process jax.distributed test (test_multihost.py).

Each process: init jax.distributed -> build the global (dp=hosts, tp)
mesh -> exercise broadcast_control / sync_hosts -> run one cross-host
jitted reduction over a dp-sharded global array.  Results land in a JSON
file the parent asserts on.
"""
import json
import os
import sys


def main():
    pid, nprocs, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                 sys.argv[3], sys.argv[4])
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ.pop('XLA_FLAGS', None)  # 1 device per process
    # the image's sitecustomize re-pins JAX_PLATFORMS=axon (real TPU) in
    # every interpreter; override in-process like tests/conftest.py does
    import jax
    jax.config.update('jax_platforms', 'cpu')

    from lmdeploy_tpu.parallel.multihost import (broadcast_control,
                                                 init_multihost,
                                                 make_global_mesh, sync_hosts)
    idx = init_multihost(f'localhost:{port}', nprocs, pid)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import NamedSharding, PartitionSpec as P

    res = {'process_index': idx,
           'process_count': jax.process_count(),
           'device_count': jax.device_count()}

    mesh = make_global_mesh(tp=1)  # dp spans the hosts
    res['mesh_shape'] = dict(mesh.shape)

    # control broadcast: host 0's payload must reach every host
    payload = (np.arange(4, dtype=np.int32) + 7 if idx == 0
               else np.zeros((4,), np.int32))
    got = broadcast_control(payload)
    res['bcast'] = got.tolist()
    sync_hosts('test-barrier')

    # cross-host dp-sharded reduction: host h owns row h of [H, 4]
    local = np.full((1, 4), idx + 1, np.float32)
    garr = multihost_utils.host_local_array_to_global_array(
        local, mesh, P('dp', None))
    total = jax.jit(jnp.sum,
                    out_shardings=NamedSharding(mesh, P()))(garr)
    res['sum'] = float(np.asarray(total.addressable_data(0)))

    with open(os.path.join(outdir, f'worker_{pid}.json'), 'w') as f:
        json.dump(res, f)


if __name__ == '__main__':
    main()
