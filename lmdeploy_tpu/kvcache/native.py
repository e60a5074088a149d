"""ctypes binding for the native C++ cache manager (csrc/cache_manager.cpp)
— the host-runtime component the reference implements as
LlamaCacheManager.cc.  Exposes NativeSequenceManager with the same
interface as kvcache.manager.SequenceManager; engine code is agnostic.

Build once with ``make -C csrc`` (or ``python -m lmdeploy_tpu.kvcache.native``
which shells out to make).  When the .so is absent, ``load()`` returns
None and the pure-Python manager is used.
"""
from __future__ import annotations

import ctypes
import os.path as osp
import subprocess
from typing import List, Optional

import numpy as np

_LIB_PATH = osp.join(osp.dirname(__file__), 'libtpucache.so')
_lib = None


def build(quiet: bool = True) -> bool:
    """Compile the shared library via make; returns success."""
    csrc = osp.join(osp.dirname(__file__), '..', '..', 'csrc')
    if not osp.exists(osp.join(csrc, 'Makefile')):
        return False
    try:
        subprocess.run(['make', '-C', csrc], check=True,
                       capture_output=quiet)
        return osp.exists(_LIB_PATH)
    except Exception:
        return False


def load():
    """dlopen + declare the C ABI; None when unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not osp.exists(_LIB_PATH) and not build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    c = ctypes
    sig = {
        'cm_create': ([c.c_int32] * 3, c.c_void_p),
        'cm_destroy': ([c.c_void_p], None),
        'cm_free_pages': ([c.c_void_p], c.c_int32),
        'cm_contains': ([c.c_void_p, c.c_int64], c.c_int32),
        'cm_create_seq': ([c.c_void_p, c.c_int64], None),
        'cm_erase': ([c.c_void_p, c.c_int64], c.c_int32),
        'cm_grow': ([c.c_void_p, c.c_int64, c.c_int32], c.c_int32),
        'cm_get_pages': ([c.c_void_p, c.c_int64, c.c_void_p, c.c_int32],
                         c.c_int32),
        'cm_set_active': ([c.c_void_p, c.c_int64, c.c_int32], None),
        'cm_set_tokens': ([c.c_void_p, c.c_int64, c.c_void_p, c.c_int32],
                          c.c_int32),
        'cm_append_token': ([c.c_void_p, c.c_int64, c.c_int32], c.c_int32),
        'cm_get_tokens': ([c.c_void_p, c.c_int64, c.c_void_p, c.c_int32],
                          c.c_int32),
        'cm_truncate_tokens': ([c.c_void_p, c.c_int64, c.c_int32], c.c_int32),
        'cm_cache_len': ([c.c_void_p, c.c_int64], c.c_int32),
        'cm_set_cache_len': ([c.c_void_p, c.c_int64, c.c_int32], None),
        'cm_set_rng': ([c.c_void_p, c.c_int64, c.c_uint32, c.c_uint32],
                       None),
        'cm_get_rng': ([c.c_void_p, c.c_int64, c.c_void_p], c.c_int32),
        'cm_set_prefix_cache': ([c.c_void_p, c.c_int32], None),
        'cm_match_prefix': ([c.c_void_p, c.c_int64, c.c_void_p, c.c_int32],
                            c.c_int32),
        'cm_publish': ([c.c_void_p, c.c_int64], None),
        'cm_prepare_rewrite': ([c.c_void_p, c.c_int64, c.c_int32],
                               c.c_int32),
        'cm_flush_prefix': ([c.c_void_p], None),
        'cm_prefix_stats': ([c.c_void_p, c.c_void_p, c.c_void_p], None),
        'cm_shared_pages': ([c.c_void_p, c.c_int64], c.c_int32),
    }
    for name, (argtypes, restype) in sig.items():
        fn = getattr(lib, name)
        fn.argtypes = argtypes
        fn.restype = restype
    _lib = lib
    return lib


from .manager import NoFreePages  # single exception type across backends


class NativeSequence:
    """Proxy with the Python Sequence's attribute surface (token_ids,
    pages, cache_len, rng_key, active) backed by the native store."""

    __slots__ = ('_mgr', 'seq_id')

    def __init__(self, mgr: 'NativeSequenceManager', seq_id: int):
        self._mgr = mgr
        self.seq_id = seq_id

    # --- token history -----------------------------------------------------
    @property
    def token_ids(self) -> '_TokenList':
        return _TokenList(self._mgr, self.seq_id)

    @token_ids.setter
    def token_ids(self, ids):
        lib, h = self._mgr._lib, self._mgr._h
        arr = np.asarray(list(ids), np.int32)
        lib.cm_set_tokens(h, self.seq_id,
                          arr.ctypes.data_as(ctypes.c_void_p), len(arr))

    @property
    def pages(self) -> List[int]:
        lib, h = self._mgr._lib, self._mgr._h
        n = lib.cm_get_pages(h, self.seq_id, None, 0)
        if n <= 0:
            return []
        out = np.empty((n,), np.int32)
        lib.cm_get_pages(h, self.seq_id,
                         out.ctypes.data_as(ctypes.c_void_p), n)
        return out.tolist()

    @property
    def cache_len(self) -> int:
        return max(0, self._mgr._lib.cm_cache_len(self._mgr._h, self.seq_id))

    @cache_len.setter
    def cache_len(self, v: int):
        self._mgr._lib.cm_set_cache_len(self._mgr._h, self.seq_id, int(v))

    @property
    def rng_key(self) -> Optional[np.ndarray]:
        out = np.empty((2,), np.uint32)
        ok = self._mgr._lib.cm_get_rng(self._mgr._h, self.seq_id,
                                       out.ctypes.data_as(ctypes.c_void_p))
        return out if ok else None

    @rng_key.setter
    def rng_key(self, key):
        a, b = (int(x) for x in np.asarray(key, np.uint32).ravel()[:2])
        self._mgr._lib.cm_set_rng(self._mgr._h, self.seq_id, a, b)

    @property
    def active(self) -> bool:
        return False  # engine only ever sets; reads go unused

    @active.setter
    def active(self, v: bool):
        self._mgr._lib.cm_set_active(self._mgr._h, self.seq_id, int(v))

    @property
    def history_len(self) -> int:
        return self._mgr._lib.cm_get_tokens(self._mgr._h, self.seq_id,
                                            None, 0)

    @property
    def shared_pages(self) -> int:
        return max(0, self._mgr._lib.cm_shared_pages(self._mgr._h,
                                                     self.seq_id))


class _TokenList:
    """List-like view over the native token history (supports the engine's
    usage: len, slicing, append, iteration, +)."""

    __slots__ = ('_mgr', '_id')

    def __init__(self, mgr, seq_id):
        self._mgr = mgr
        self._id = seq_id

    def _all(self) -> List[int]:
        lib, h = self._mgr._lib, self._mgr._h
        n = lib.cm_get_tokens(h, self._id, None, 0)
        if n <= 0:
            return []
        out = np.empty((n,), np.int32)
        lib.cm_get_tokens(h, self._id, out.ctypes.data_as(ctypes.c_void_p),
                          n)
        return out.tolist()

    def __len__(self):
        return max(0, self._mgr._lib.cm_get_tokens(self._mgr._h, self._id,
                                                   None, 0))

    def __getitem__(self, idx):
        return self._all()[idx]

    def __iter__(self):
        return iter(self._all())

    def __add__(self, other):
        return self._all() + list(other)

    def __radd__(self, other):
        return list(other) + self._all()

    def __eq__(self, other):
        return self._all() == list(other)

    def append(self, tok: int):
        self._mgr._lib.cm_append_token(self._mgr._h, self._id, int(tok))


class NativeSequenceManager:
    """Drop-in for kvcache.manager.SequenceManager over the C++ core."""

    def __init__(self, num_pages: int, page_size: int,
                 max_entries: int = 0, enable_prefix_cache: bool = True):
        self._lib = load()
        assert self._lib is not None, 'libtpucache.so unavailable'
        self._h = self._lib.cm_create(num_pages, page_size, max_entries)
        self.page_size = page_size
        self.num_pages = num_pages
        self.enable_prefix_cache = enable_prefix_cache
        if not enable_prefix_cache:
            self._lib.cm_set_prefix_cache(self._h, 0)

    def __del__(self):
        try:
            self._lib.cm_destroy(self._h)
        except Exception:
            pass

    @property
    def free_count(self) -> int:
        return self._lib.cm_free_pages(self._h)

    def __contains__(self, seq_id: int) -> bool:
        return bool(self._lib.cm_contains(self._h, int(seq_id)))

    def get(self, seq_id: int) -> Optional[NativeSequence]:
        if seq_id not in self:
            return None
        return NativeSequence(self, int(seq_id))

    def create(self, seq_id: int) -> NativeSequence:
        self._lib.cm_create_seq(self._h, int(seq_id))
        return NativeSequence(self, int(seq_id))

    def fetch(self, seq_id: int) -> Optional[NativeSequence]:
        return self.get(seq_id)

    def erase(self, seq_id: int) -> None:
        self._lib.cm_erase(self._h, int(seq_id))

    def grow(self, seq: NativeSequence, new_total_tokens: int) -> List[int]:
        r = self._lib.cm_grow(self._h, seq.seq_id, int(new_total_tokens))
        if r < 0:
            raise NoFreePages(f'cannot grow seq {seq.seq_id} to '
                              f'{new_total_tokens} tokens')
        return seq.pages

    def release(self, seq: NativeSequence) -> None:
        self._lib.cm_set_active(self._h, seq.seq_id, 0)

    def truncate(self, seq: NativeSequence, n: int) -> None:
        self._lib.cm_truncate_tokens(self._h, seq.seq_id, int(n))

    # -- prefix caching (mirrors manager.SequenceManager) -------------------

    def match_prefix(self, seq: NativeSequence, all_ids) -> int:
        arr = np.asarray(list(all_ids), np.int32)
        r = self._lib.cm_match_prefix(
            self._h, seq.seq_id, arr.ctypes.data_as(ctypes.c_void_p),
            len(arr))
        return max(0, r)

    def publish(self, seq: NativeSequence) -> None:
        self._lib.cm_publish(self._h, seq.seq_id)

    def prepare_rewrite(self, seq: NativeSequence,
                        new_cache_len: int) -> int:
        r = self._lib.cm_prepare_rewrite(self._h, seq.seq_id,
                                         int(new_cache_len))
        if r < 0:
            raise NoFreePages(f'cannot privatize seq {seq.seq_id}')
        return r

    def flush_prefix(self) -> None:
        self._lib.cm_flush_prefix(self._h)

    @property
    def prefix_hits(self) -> int:
        h = ctypes.c_int64(0)
        lo = ctypes.c_int64(0)
        self._lib.cm_prefix_stats(self._h, ctypes.byref(h),
                                  ctypes.byref(lo))
        return h.value

    @property
    def prefix_lookups(self) -> int:
        h = ctypes.c_int64(0)
        lo = ctypes.c_int64(0)
        self._lib.cm_prefix_stats(self._h, ctypes.byref(h),
                                  ctypes.byref(lo))
        return lo.value


__all__ = ['NativeSequenceManager', 'NativeSequence', 'NoFreePages',
           'build', 'load']

if __name__ == '__main__':
    ok = build(quiet=False)
    print('built' if ok else 'build failed')
