"""Chip health gate for the .r5 measurement queue (VERDICT r4 weak #4).

Exit 0 = chip alive AND enough free HBM to start a measurement job.
Exit 1 = degraded (alive but can't hold the requested HBM floor).
Exit 2 = probe subprocess itself failed/hung (tunnel wedge class).

The HBM floor probe allocates `--gb` gigabytes in 2 GB slabs and frees
them; a leaked-HBM chip (dead clients pinning memory server-side, the
round-4 failure mode) fails the allocation with RESOURCE_EXHAUSTED.
"""
import argparse
import json
import subprocess
import sys
import time

CODE = """
import json, time
t0 = time.time()
import jax, jax.numpy as jnp, numpy as np
x = jnp.ones((128, 128), jnp.bfloat16)
v = float(np.asarray(jnp.dot(x, x))[0, 0])
ok = True
err = None
try:
    n = {gb} // 2
    xs = [jnp.ones((1024, 1024, 1024), jnp.bfloat16) for _ in range(n)]
    for a in xs:
        a.block_until_ready()
    del xs
except Exception as e:
    ok = False
    err = type(e).__name__
print(json.dumps({{'alive': True, 'hbm_ok': ok, 'hbm_err': err,
                  'secs': round(time.time() - t0, 1)}}))
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--gb', type=int, default=10,
                    help='free-HBM floor to require (GB)')
    # healthy handshakes on this tunnel measure 4s..300s+ (round-5 queue
    # logs); a timeout below ~400s misclassifies slow-but-alive as wedged
    ap.add_argument('--timeout', type=float, default=480.0)
    args = ap.parse_args()
    try:
        out = subprocess.run(
            [sys.executable, '-c', CODE.format(gb=args.gb)],
            capture_output=True, text=True, timeout=args.timeout)
    except subprocess.TimeoutExpired:
        print(json.dumps({'alive': False, 'reason': 'probe timeout'}))
        sys.exit(2)
    line = [l for l in out.stdout.splitlines() if l.startswith('{')]
    if not line:
        print(json.dumps({'alive': False,
                          'reason': out.stderr.strip()[-200:]}))
        sys.exit(2)
    res = json.loads(line[-1])
    print(json.dumps(res))
    sys.exit(0 if res.get('hbm_ok') else 1)


if __name__ == '__main__':
    main()
