"""On-disk cache of preprocessed graphs (LMDB-dataset equivalent).

Replaces reference `alignn/lmdb_dataset.py`: graphs are built once,
serialized as compact binary blobs into the native mmap record store
(alignn_tpu/native/recordstore.cpp), and read back zero-copy-ish for
training.  Falls back to a pure-Python file layout with identical
format when the native library is unavailable.

Blob format per record: npz-free custom packing — int32 header
[n_arrays], then per array: name_len, name bytes, dtype byte, ndim,
shape int64s, raw data.  (pickle-free: robust across Python versions.)
"""

from __future__ import annotations

import ctypes
import os
import struct
from typing import List, Optional

import numpy as np

from alignn_tpu.graph.build import GraphData

_DTYPES = {0: np.int32, 1: np.int64, 2: np.float32, 3: np.float64}
_DTYPE_IDS = {np.dtype(v): k for k, v in _DTYPES.items()}

_FIELDS = ("z", "frac_coords", "lattice", "src", "dst", "r", "images",
           "lg_src", "lg_dst", "target", "atomwise_target", "forces",
           "stress", "additional", "extra_features")


def pack_graph(g: GraphData) -> bytes:
    parts = []
    arrays = {}
    for name in _FIELDS:
        v = getattr(g, name)
        if v is not None:
            arrays[name] = np.asarray(v)
    arrays["volume"] = np.asarray([g.volume], dtype=np.float64)
    parts.append(struct.pack("<i", len(arrays)))
    for name, arr in arrays.items():
        if arr.dtype not in _DTYPE_IDS:
            arr = arr.astype(np.float64)
        nb = name.encode()
        parts.append(struct.pack("<i", len(nb)))
        parts.append(nb)
        parts.append(struct.pack("<bb", _DTYPE_IDS[arr.dtype], arr.ndim))
        parts.append(struct.pack(f"<{arr.ndim}q", *arr.shape))
        parts.append(np.ascontiguousarray(arr).tobytes())
    return b"".join(parts)


def unpack_graph(buf: bytes) -> GraphData:
    off = 0
    (n_arrays,) = struct.unpack_from("<i", buf, off)
    off += 4
    arrays = {}
    for _ in range(n_arrays):
        (nlen,) = struct.unpack_from("<i", buf, off)
        off += 4
        name = buf[off:off + nlen].decode()
        off += nlen
        dt, ndim = struct.unpack_from("<bb", buf, off)
        off += 2
        shape = struct.unpack_from(f"<{ndim}q", buf, off)
        off += 8 * ndim
        dtype = np.dtype(_DTYPES[dt])
        count = int(np.prod(shape)) if ndim else 1
        arr = np.frombuffer(buf, dtype=dtype, count=count,
                            offset=off).reshape(shape)
        off += count * dtype.itemsize
        arrays[name] = arr.copy()
    vol = float(arrays.pop("volume")[0])
    kwargs = {k: arrays.get(k) for k in _FIELDS}
    return GraphData(volume=vol, **kwargs)


class _PyWriter:
    def __init__(self, path: str):
        self.path = path
        self.data = open(path + ".data", "wb")
        self.offsets: List[int] = []
        self.lengths: List[int] = []
        self.pos = 0

    def put(self, blob: bytes) -> int:
        self.data.write(blob)
        self.offsets.append(self.pos)
        self.lengths.append(len(blob))
        self.pos += len(blob)
        return len(self.offsets) - 1

    def close(self):
        self.data.close()
        with open(self.path + ".idx", "wb") as f:
            f.write(struct.pack("<q", len(self.offsets)))
            for o, l in zip(self.offsets, self.lengths):
                f.write(struct.pack("<qq", o, l))


class _PyReader:
    def __init__(self, path: str):
        with open(path + ".idx", "rb") as f:
            (self.n,) = struct.unpack("<q", f.read(8))
            self.index = np.frombuffer(f.read(), dtype=np.int64).reshape(
                self.n, 2)
        # np.memmap refuses zero-byte files; an empty split (n_test=0)
        # writes a valid empty cache that must still open
        if self.n == 0 or os.path.getsize(path + ".data") == 0:
            self.data = np.zeros(0, dtype=np.uint8)
        else:
            self.data = np.memmap(path + ".data", dtype=np.uint8,
                                  mode="r")

    def get(self, i: int) -> bytes:
        off, ln = self.index[i]
        return bytes(self.data[off:off + ln])

    def close(self):
        del self.data


def _native_lib() -> Optional[ctypes.CDLL]:
    from alignn_tpu.native import load

    lib = load("recordstore")
    if lib is None:
        return None
    if not getattr(lib, "_configured", False):
        lib.rs_writer_open.restype = ctypes.c_void_p
        lib.rs_writer_open.argtypes = [ctypes.c_char_p]
        lib.rs_writer_put.restype = ctypes.c_int64
        lib.rs_writer_put.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                      ctypes.c_int64]
        lib.rs_writer_close.restype = ctypes.c_int
        lib.rs_writer_close.argtypes = [ctypes.c_void_p]
        lib.rs_reader_open.restype = ctypes.c_void_p
        lib.rs_reader_open.argtypes = [ctypes.c_char_p]
        lib.rs_reader_count.restype = ctypes.c_int64
        lib.rs_reader_count.argtypes = [ctypes.c_void_p]
        lib.rs_reader_get.restype = ctypes.c_int64
        lib.rs_reader_get.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                      ctypes.c_char_p, ctypes.c_int64]
        lib.rs_reader_close.argtypes = [ctypes.c_void_p]
        lib._configured = True
    return lib


class GraphCacheWriter:
    """Streaming writer: graphs go to disk one at a time (O(1) memory).

    The ALIGNN-FF-scale ingest path (300k+ structures) builds, packs and
    appends each graph without ever materializing the full list —
    replacing the reference's LMDB write txn loop
    (lmdb_dataset.py:155-226).
    """

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._lib = _native_lib()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.rs_writer_open(path.encode())
        if not self._h:
            self._lib = None
            self._py = _PyWriter(path)
        self.count = 0

    def put(self, g: GraphData):
        blob = pack_graph(g)
        if self._lib:
            # a swallowed fwrite failure would silently skip a record
            # and shift every later cache index off its id/target
            if self._lib.rs_writer_put(self._h, blob, len(blob)) < 0:
                raise IOError(
                    f"record-store write failed at record {self.count} "
                    f"(disk full?); cache is incomplete")
        else:
            self._py.put(blob)
        self.count += 1

    def close(self):
        if self._lib:
            if self._h:
                rc = self._lib.rs_writer_close(self._h)
                self._h = None
                if rc != 0:
                    raise IOError("record-store close failed "
                                  "(index flush error); cache is "
                                  "incomplete")
        else:
            self._py.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class GraphCache:
    """Write-once / read-many cache of GraphData records."""

    @staticmethod
    def write(path: str, graphs: List[GraphData]):
        with GraphCacheWriter(path) as w:
            for g in graphs:
                w.put(g)

    def __init__(self, path: str):
        self.path = path
        self._lib = _native_lib()
        self._h = None
        if self._lib is not None:
            self._h = self._lib.rs_reader_open(path.encode())
        if not self._h:
            self._lib = None
            self._py = _PyReader(path)

    def __len__(self) -> int:
        if self._lib:
            return int(self._lib.rs_reader_count(self._h))
        return self._py.n

    def __getitem__(self, i: int) -> GraphData:
        if self._lib:
            ln = self._lib.rs_reader_get(self._h, i, None, 0)
            if ln < 0:
                raise IndexError(i)
            buf = ctypes.create_string_buffer(int(ln))
            self._lib.rs_reader_get(self._h, i, buf, ln)
            return unpack_graph(buf.raw)
        return unpack_graph(self._py.get(i))

    def close(self):
        if self._lib and self._h:
            self._lib.rs_reader_close(self._h)
            self._h = None

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(path + ".idx") and \
            os.path.exists(path + ".data")
