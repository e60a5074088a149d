"""Summarize a ``jax.profiler.trace`` capture into a per-op time table.

The reference publishes per-kernel time splits from nsys/NVTX ranges
(`/root/reference/benchmark/profile_generation.py` wraps the engine with
per-token timestamps; kernel-level attribution is done manually with
nsight).  On TPU the equivalent artifact is the XLA xplane trace that
``jax.profiler.trace(dir)`` writes; this tool parses the ``.xplane.pb``
protos (via tensorflow's bundled tsl proto, no TF runtime needed) and
prints where the device time goes, aggregated by HLO op category and by
the top individual fusions/custom-calls.

Usage:
    python benchmark/trace_summary.py <trace_dir> [--top N] [--json]

``trace_dir`` is the directory passed to ``jax.profiler.trace`` (the
tool walks ``plugins/profile/*/ *.xplane.pb`` under it) or a direct path
to one ``.xplane.pb`` file.
"""
from __future__ import annotations

import argparse
import collections
import glob
import json
import os
import re
import sys


def _load_xspaces(path):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    if os.path.isfile(path):
        files = [path]
    else:
        files = sorted(
            glob.glob(os.path.join(path, '**', '*.xplane.pb'),
                      recursive=True))
    if not files:
        raise SystemExit(f'no .xplane.pb under {path}')
    spaces = []
    for f in files:
        xs = xplane_pb2.XSpace()
        with open(f, 'rb') as fh:
            xs.ParseFromString(fh.read())
        spaces.append((f, xs))
    return spaces


# XLA op-name prefixes → coarse category.  Fusions are further split by
# the hero op XLA bakes into the name (e.g. "fusion.1234" with metadata
# naming dot/reduce/scatter).
_CATEGORY_PATTERNS = [
    (re.compile(r'(convert|copy|bitcast|transpose|reshape)'), 'layout/convert'),
    (re.compile(r'custom-call|CustomCall|tpu_custom_call'), 'pallas custom-call'),
    (re.compile(r'dot|matmul|gemm|conv'), 'matmul'),
    (re.compile(r'(all-reduce|all-gather|reduce-scatter|collective'
                r'|psum|ppermute)'), 'collective'),
    (re.compile(r'(dynamic-update-slice|scatter)'), 'scatter/update'),
    (re.compile(r'(gather|dynamic-slice)'), 'gather/slice'),
    (re.compile(r'(sort|top-k|topk)'), 'sort/topk'),
    (re.compile(r'(reduce|softmax)'), 'reduce'),
    (re.compile(r'(rng|random)'), 'rng'),
    (re.compile(r'(infeed|outfeed|send|recv|host)'), 'host transfer'),
]


def _categorize(name: str) -> str:
    low = name.lower()
    for pat, cat in _CATEGORY_PATTERNS:
        if pat.search(low):
            return cat
    if low.startswith('fusion'):
        return 'fusion (elementwise)'
    return 'other'


def _is_device_plane(plane_name: str) -> bool:
    # TPU device planes are named like "/device:TPU:0"; the CPU backend
    # uses "/host:CPU" for its op plane.  Skip pure host/python planes.
    low = plane_name.lower()
    if '/device:' in low:
        return True
    return low.startswith('/host:cpu') and 'xla' not in low


def summarize(path: str, top: int = 25):
    spaces = _load_xspaces(path)
    by_op = collections.Counter()        # exact op name → ps
    by_cat = collections.Counter()       # category → ps
    occur = collections.Counter()        # op name → count
    plane_names = []
    total_span = 0
    for _, xs in spaces:
        for plane in xs.planes:
            if not _is_device_plane(plane.name):
                continue
            plane_names.append(plane.name)
            emeta = plane.event_metadata
            lo, hi = None, 0
            for line in plane.lines:
                for ev in line.events:
                    name = emeta[ev.metadata_id].name
                    # host-plane Python frames (CPU-backend traces only)
                    if name.startswith('$') or '.py:' in name \
                            or name.startswith('PjitFunction'):
                        continue
                    dur = ev.duration_ps
                    by_op[name] += dur
                    occur[name] += 1
                    by_cat[_categorize(name)] += dur
                    t0 = ev.offset_ps
                    lo = t0 if lo is None else min(lo, t0)
                    hi = max(hi, t0 + dur)
            if lo is not None:
                total_span += hi - lo
    busy = sum(by_op.values())
    return {
        'planes': plane_names,
        'busy_ms': busy / 1e9,
        'span_ms': total_span / 1e9,
        'categories': [
            {'category': c, 'ms': v / 1e9,
             'pct_busy': 100.0 * v / busy if busy else 0.0}
            for c, v in by_cat.most_common()],
        'top_ops': [
            {'op': o, 'ms': v / 1e9, 'count': occur[o],
             'pct_busy': 100.0 * v / busy if busy else 0.0}
            for o, v in by_op.most_common(top)],
    }


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument('trace_dir')
    ap.add_argument('--top', type=int, default=25)
    ap.add_argument('--json', action='store_true')
    args = ap.parse_args(argv)
    s = summarize(args.trace_dir, args.top)
    if args.json:
        json.dump(s, sys.stdout, indent=1)
        print()
        return
    print(f"planes: {', '.join(s['planes'])}")
    print(f"device busy: {s['busy_ms']:.2f} ms over {s['span_ms']:.2f} ms span")
    print('\n-- by category --')
    for c in s['categories']:
        print(f"  {c['category']:<24} {c['ms']:>9.3f} ms  {c['pct_busy']:5.1f}%")
    print(f"\n-- top {args.top} ops --")
    for o in s['top_ops']:
        print(f"  {o['ms']:>9.3f} ms {o['pct_busy']:5.1f}% x{o['count']:<5} {o['op']}")


if __name__ == '__main__':
    main()
