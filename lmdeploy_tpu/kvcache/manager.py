"""Host-side page allocator and sequence (session) manager.

The "cache of KV caches" of the reference (src/turbomind/models/llama/
LlamaCacheManager.cc) rebuilt around pages instead of per-sequence slabs:

- :class:`PageAllocator` — free-list over the device KV pool's P pages,
  chunked growth semantics replaced by page granularity.
- :class:`SequenceManager` — create/fetch/update/erase with LRU eviction
  of inactive sequences (evict:162-183).  Evicted sequences keep their
  token ids so a later fetch re-decodes the missing tokens (the reference's
  cache-miss path, LlamaBatch.cc:680-699).  Per-sequence RNG key data is
  snapshotted here exactly like the reference snapshots curand state
  (LlamaBatch.cc:363-377,1097-1108) — with JAX keys it is just two uint32s.
"""
from __future__ import annotations

import dataclasses
import threading
import time
from typing import Dict, List, Optional

import numpy as np


class NoFreePages(Exception):
    pass


class PageAllocator:
    """Free-list allocator over page ids [0, num_pages)."""

    def __init__(self, num_pages: int):
        self.num_pages = num_pages
        self._free: List[int] = list(range(num_pages - 1, -1, -1))
        self._lock = threading.Lock()

    @property
    def free_count(self) -> int:
        return len(self._free)

    def alloc(self, n: int) -> List[int]:
        with self._lock:
            if n > len(self._free):
                raise NoFreePages(f'need {n}, have {len(self._free)}')
            out = [self._free.pop() for _ in range(n)]
            return out

    def free(self, pages: List[int]) -> None:
        with self._lock:
            self._free.extend(pages)


@dataclasses.dataclass
class Sequence:
    """One interactive session's cached state (reference:
    LlamaCacheManager.h:47-62 — token_ids, cache_len, ptrs, rng, timestamp)."""
    seq_id: int
    token_ids: List[int] = dataclasses.field(default_factory=list)
    cache_len: int = 0                  # tokens with valid KV in pages
    pages: List[int] = dataclasses.field(default_factory=list)
    rng_key: Optional[np.ndarray] = None  # uint32 [2]
    timestamp: float = 0.0
    active: bool = False                # currently bound to a batch slot

    @property
    def history_len(self) -> int:
        return len(self.token_ids)


class SequenceManager:
    """Session store with LRU eviction and miss-recompute semantics."""

    def __init__(self, allocator: PageAllocator, page_size: int,
                 max_entries: int = 0):
        self.allocator = allocator
        self.page_size = page_size
        self.max_entries = max_entries  # 0 = unbounded (pages still bound)
        self._seqs: Dict[int, Sequence] = {}
        self._lock = threading.Lock()

    def __contains__(self, seq_id: int) -> bool:
        return seq_id in self._seqs

    @property
    def free_count(self) -> int:
        return self.allocator.free_count

    def get(self, seq_id: int) -> Optional[Sequence]:
        return self._seqs.get(seq_id)

    def create(self, seq_id: int) -> Sequence:
        """(Re)create a session; frees any previous state under this id
        (reference: LlamaCacheManager::create erases an existing entry)."""
        self.erase(seq_id)
        seq = Sequence(seq_id=seq_id, timestamp=time.monotonic())
        with self._lock:
            self._seqs[seq_id] = seq
        self._maybe_trim()
        return seq

    def fetch(self, seq_id: int) -> Optional[Sequence]:
        """Return an existing session (possibly evicted -> cache_len==0 and
        empty pages; caller must re-decode token_ids)."""
        seq = self._seqs.get(seq_id)
        if seq is not None:
            seq.timestamp = time.monotonic()
        return seq

    def erase(self, seq_id: int) -> None:
        with self._lock:
            seq = self._seqs.pop(seq_id, None)
        if seq is not None and seq.pages:
            self.allocator.free(seq.pages)
            seq.pages = []

    def grow(self, seq: Sequence, new_total_tokens: int) -> List[int]:
        """Ensure the sequence has pages covering ``new_total_tokens``;
        evicts LRU inactive sequences on pressure.  Returns the page list.
        Raises NoFreePages when even full eviction cannot satisfy."""
        need = -(-new_total_tokens // self.page_size)  # ceil
        while len(seq.pages) < need:
            want = need - len(seq.pages)
            try:
                seq.pages.extend(self.allocator.alloc(want))
            except NoFreePages:
                if not self._evict_one(exclude=seq.seq_id):
                    raise
        return seq.pages

    def release(self, seq: Sequence) -> None:
        """Unbind from batch slot, keep cache for future turns."""
        seq.active = False
        seq.timestamp = time.monotonic()

    def _evict_one(self, exclude: int) -> bool:
        """Free the pages of the least-recently-used inactive sequence
        (reference: LlamaCacheManager::evict). Keeps token ids."""
        with self._lock:
            candidates = [s for s in self._seqs.values()
                          if not s.active and s.pages and s.seq_id != exclude]
            if not candidates:
                return False
            victim = min(candidates, key=lambda s: s.timestamp)
            self.allocator.free(victim.pages)
            victim.pages = []
            victim.cache_len = 0
            return True

    def _maybe_trim(self) -> None:
        """Bound the number of cached sessions (cache_max_entry_count)."""
        if not self.max_entries:
            return
        with self._lock:
            inactive = [s for s in self._seqs.values() if not s.active]
            excess = len(self._seqs) - self.max_entries
            if excess <= 0:
                return
            for victim in sorted(inactive, key=lambda s: s.timestamp)[:excess]:
                if victim.pages:
                    self.allocator.free(victim.pages)
                del self._seqs[victim.seq_id]


class GroupedSequenceManager:
    """dp-group façade over independent per-group sequence managers.

    Each dp group owns its own page pool (one shard of the device KV
    pool's page dim) with pool-LOCAL page ids, so a session is sticky to
    the group holding its pages.  This is the host half of the engine's
    dp scale-out (SURVEY.md §7 step 9) — the reference has no equivalent
    (single-node NCCL engine, turbomind.py:81-83 hard-codes node 0).
    Works over both the Python and native-C++ per-group backends.
    """

    def __init__(self, managers):
        self.managers = list(managers)
        self.page_size = self.managers[0].page_size
        self._group: Dict[int, int] = {}
        self._lock = threading.Lock()

    @property
    def num_groups(self) -> int:
        return len(self.managers)

    def __contains__(self, seq_id: int) -> bool:
        return seq_id in self._group

    def group_of(self, seq_id: int) -> Optional[int]:
        return self._group.get(seq_id)

    def free_count(self, group: int) -> int:
        return self.managers[group].free_count

    def create(self, seq_id: int, group: int = 0):
        self.erase(seq_id)
        with self._lock:
            self._group[seq_id] = group
        return self.managers[group].create(seq_id)

    def fetch(self, seq_id: int):
        g = self._group.get(seq_id)
        return None if g is None else self.managers[g].fetch(seq_id)

    def get(self, seq_id: int):
        g = self._group.get(seq_id)
        return None if g is None else self.managers[g].get(seq_id)

    def erase(self, seq_id: int) -> None:
        with self._lock:
            g = self._group.pop(seq_id, None)
        if g is not None:
            self.managers[g].erase(seq_id)

    def grow(self, seq, new_total_tokens: int):
        return self.managers[self._group[seq.seq_id]].grow(
            seq, new_total_tokens)

    def release(self, seq) -> None:
        self.managers[self._group[seq.seq_id]].release(seq)

    def clear(self) -> None:
        """Drop every session (device-state reset after a backend
        error: cached KV content is gone, so sessions cannot resume)."""
        with self._lock:
            ids = list(self._group.items())
            self._group.clear()
        for seq_id, g in ids:
            self.managers[g].erase(seq_id)


__all__ = ['PageAllocator', 'Sequence', 'SequenceManager',
           'GroupedSequenceManager', 'NoFreePages']
