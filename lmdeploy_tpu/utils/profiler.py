"""Profiling helpers — the NVTX-range equivalent for TPU.

Reference: src/turbomind/utils/nvtx_utils.h PUSH_RANGE/POP_RANGE around
hot regions + wall-clock phase logs (LlamaBatch.cc:776).  On TPU:
jax.profiler traces (viewable in xprof/tensorboard) plus lightweight
host-side phase timers the engine logs per decode round."""
from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a jax profiler trace (xprof) around a region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace region (the PUSH_RANGE/POP_RANGE analogue)."""
    import jax
    return jax.profiler.TraceAnnotation(name)


class PhaseTimer:
    """Accumulating host-side phase timer (engine loop phases)."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = []
        for name in sorted(self.totals):
            t, n = self.totals[name], self.counts[name]
            lines.append(f'{name}: {t:.3f}s over {n} '
                         f'({t / max(n, 1) * 1e3:.2f} ms each)')
        return '\n'.join(lines)


__all__ = ['trace', 'annotate', 'PhaseTimer']
