"""ctypes bindings for the native page allocator (+ build-on-demand).

The C++ core (runtime/native/page_allocator.cpp) is compiled once with g++
into a shared library cached next to the source; a pure-Python fallback
keeps the framework importable on machines without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "page_allocator.cpp")
_SO = os.path.join(os.path.dirname(__file__), "native", "libpage_allocator.so")


def _build():
    cmd = ["g++", "-O2", "-shared", "-fPIC", "-std=c++17", _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    if (not os.path.exists(_SO)
            or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
        _build()
    lib = ctypes.CDLL(_SO)
    lib.pa_create.restype = ctypes.c_void_p
    lib.pa_create.argtypes = [ctypes.c_int32, ctypes.c_int32]
    lib.pa_destroy.argtypes = [ctypes.c_void_p]
    lib.pa_num_free.restype = ctypes.c_int32
    lib.pa_num_free.argtypes = [ctypes.c_void_p]
    for name in ("pa_create_seq", "pa_append_tokens", "pa_fork",
                 "pa_free_seq", "pa_num_tokens", "pa_trim_front"):
        fn = getattr(lib, name)
        fn.restype = ctypes.c_int64
    lib.pa_create_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pa_append_tokens.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                     ctypes.c_int64]
    lib.pa_trim_front.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                  ctypes.c_int64]
    lib.pa_fork.argtypes = [ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64]
    lib.pa_free_seq.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pa_num_tokens.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.pa_ensure_writable_last.restype = ctypes.c_int32
    lib.pa_ensure_writable_last.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
    lib.pa_block_table.restype = ctypes.c_int64
    lib.pa_block_table.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64, ctypes.c_int32]
    return lib


_lib = None


def _get_lib():
    global _lib
    if _lib is None:
        _lib = _load()
    return _lib


class PageAllocator:
    """Paged KV-cache allocator backed by the native C++ core.

    Manages physical-page free lists and per-sequence block tables with
    ref-counted pages (prefix sharing via :meth:`fork` + copy-on-write via
    :meth:`ensure_writable_last`).
    """

    def __init__(self, num_pages: int, page_size: int):
        self._lib = _get_lib()
        self._pa = self._lib.pa_create(num_pages, page_size)
        self.num_pages = num_pages
        self.page_size = page_size

    def __del__(self):
        if getattr(self, "_pa", None):
            self._lib.pa_destroy(self._pa)
            self._pa = None

    @property
    def num_free_pages(self) -> int:
        return self._lib.pa_num_free(self._pa)

    def create_seq(self, seq_id: int) -> None:
        if self._lib.pa_create_seq(self._pa, seq_id) < 0:
            raise ValueError(f"sequence {seq_id} already exists")

    def append_tokens(self, seq_id: int, n: int = 1) -> int:
        """Returns new token count; raises MemoryError when out of pages."""
        r = self._lib.pa_append_tokens(self._pa, seq_id, n)
        if r < 0:
            raise MemoryError(f"out of KV pages appending to seq {seq_id}")
        return r

    def try_append_tokens(self, seq_id: int, n: int = 1) -> int:
        """Like append_tokens but returns -1 instead of raising."""
        return self._lib.pa_append_tokens(self._pa, seq_id, n)

    def fork(self, parent_id: int, child_id: int) -> None:
        if self._lib.pa_fork(self._pa, parent_id, child_id) < 0:
            raise ValueError(f"cannot fork {parent_id} -> {child_id}")

    def ensure_writable_last(self, seq_id: int) -> tuple[int, int]:
        """(dst_page, src_page): dst == src when already exclusive; else
        the engine must copy src's rows into dst on device."""
        src = ctypes.c_int32(-1)
        dst = self._lib.pa_ensure_writable_last(self._pa, seq_id,
                                                ctypes.byref(src))
        if dst < 0:
            raise MemoryError(f"copy-on-write failed for seq {seq_id}")
        return int(dst), int(src.value)

    def trim_front(self, seq_id: int, keep_from_token: int) -> int:
        """Sliding-window reclaim: free pages wholly before
        ``keep_from_token``.  Trimmed block-table slots become -1
        placeholders (never read by the kernel under kv_start).  Returns
        the number of pages freed."""
        r = self._lib.pa_trim_front(self._pa, seq_id, keep_from_token)
        if r < 0:
            raise KeyError(seq_id)
        return r

    def free_seq(self, seq_id: int) -> None:
        self._lib.pa_free_seq(self._pa, seq_id)

    def num_tokens(self, seq_id: int) -> int:
        return self._lib.pa_num_tokens(self._pa, seq_id)

    def block_table(self, seq_id: int, max_len: int,
                    pad_value: int = 0) -> np.ndarray:
        out = np.empty(max_len, dtype=np.int32)
        n = self._lib.pa_block_table(
            self._pa, seq_id,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_len, pad_value)
        if n < 0:
            raise KeyError(seq_id)
        return out
