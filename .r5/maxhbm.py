"""Bisect the chip's actually-allocatable HBM (leaked-HBM diagnostic).

Allocates 1 GB slabs until RESOURCE_EXHAUSTED, reports the high-water
mark, frees everything.  Prints ONE JSON line.
"""
import json
import sys

sys.path.insert(0, '/root/repo')


def main():
    import jax
    import jax.numpy as jnp

    xs = []
    got = 0
    err = None
    try:
        for i in range(16):
            a = jnp.ones((512, 1024, 1024), jnp.bfloat16)   # 1 GB
            a.block_until_ready()
            xs.append(a)
            got += 1
    except Exception as e:
        err = type(e).__name__
    del xs
    print(json.dumps({'allocatable_gb': got, 'stopped_by': err,
                      'device': str(jax.devices()[0])}), flush=True)


if __name__ == '__main__':
    main()
