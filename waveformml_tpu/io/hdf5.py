"""Streaming HDF5 table IO.

Reproduces the reference's src/datasets/HDF5IO.py: ``H5Input.next_chunk`` with
event-boundary-preserving reads (:55-79), ``H5Output`` chunked gzip table
writing (:88-108), and ``P2XTableWriter`` which replicates the PyTables
``CLASS/FIELD_n_NAME/TITLE/VERSION/abstime/runtime/calgrp/nevents`` attribute
conventions (:134-206) so outputs stay readable by the experiment's toolchain.

TPU-era improvements over the reference:
- the event-extension read is a block read (the reference reads one row at a
  time, HDF5IO.py:70-78), so streaming throughput is bounded by HDF5 chunk
  decode, not per-row h5py calls;
- gzip-chunked tables are decoded and encoded by a THREAD POOL using direct
  chunk IO (``read_direct_chunk``/``write_direct_chunk`` + zlib, which
  releases the GIL), so the deflate work — the host-side hot loop of the
  streaming-inference pipeline — parallelizes across cores instead of
  serializing inside HDF5's filter pipeline.
"""
from __future__ import annotations

import os
import zlib
from collections import OrderedDict, deque
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional, Sequence

import h5py
import numpy as np
from h5py import Datatype, h5t

_POOL: Optional[ThreadPoolExecutor] = None


def _gzip_pool() -> ThreadPoolExecutor:
    """Shared deflate worker pool (zlib drops the GIL, so threads scale)."""
    global _POOL
    if _POOL is None:
        _POOL = ThreadPoolExecutor(
            max_workers=int(os.environ.get("WFML_GZIP_WORKERS",
                                           min(8, os.cpu_count() or 4))),
            thread_name_prefix="wfml-gzip")
    return _POOL


def _gzip_only_dataset(ds: h5py.Dataset) -> bool:
    """True when the dataset is 1-D, chunked, and deflate is its only filter
    — the layout every table in this chain uses — so raw chunk bytes are a
    plain zlib stream we can (de)compress off to the side."""
    return (ds.chunks is not None and len(ds.shape) == 1
            and ds.compression == "gzip" and not ds.shuffle
            and not ds.fletcher32 and ds.scaleoffset is None)


class ParallelChunkReader:
    """Decode gzip HDF5 chunks on the shared thread pool with readahead.

    ``read(lo, hi)`` returns rows [lo, hi) like a dataset slice, but the
    deflate of each chunk runs on worker threads (h5py only fetches the raw
    compressed bytes under its own lock), and chunks past ``hi`` are
    prefetched so a sequential reader never waits on a cold chunk."""

    def __init__(self, ds: h5py.Dataset, readahead: int = 8):
        self.ds = ds
        self.chunk = int(ds.chunks[0])
        self.n = int(ds.shape[0])
        self.n_chunks = -(-self.n // self.chunk)
        self.readahead = readahead
        self._cache: "OrderedDict[int, np.ndarray]" = OrderedDict()
        self._futures: Dict[int, Any] = {}

    def _decode(self, ci: int) -> np.ndarray:
        lo = ci * self.chunk
        try:
            fmask, raw = self.ds.id.read_direct_chunk((lo,))
        except Exception:
            return np.asarray(self.ds[lo:min(lo + self.chunk, self.n)])
        if fmask != 0:  # deflate was skipped for this chunk
            return np.asarray(self.ds[lo:min(lo + self.chunk, self.n)])
        arr = np.frombuffer(zlib.decompress(raw), dtype=self.ds.dtype)
        return arr[:min(self.chunk, self.n - lo)]

    def _ensure(self, ci: int) -> None:
        if ci < self.n_chunks and ci not in self._cache and ci not in self._futures:
            self._futures[ci] = _gzip_pool().submit(self._decode, ci)

    def _get(self, ci: int) -> np.ndarray:
        if ci not in self._cache:
            self._ensure(ci)
            self._cache[ci] = self._futures.pop(ci).result()
            while len(self._cache) > 2 * self.readahead + 4:
                self._cache.popitem(last=False)
        return self._cache[ci]

    def read(self, lo: int, hi: int) -> np.ndarray:
        hi = min(hi, self.n)
        if hi <= lo:  # empty table / empty request: no chunk 0 to decode
            return np.empty((0,), dtype=self.ds.dtype)
        c0, c1 = lo // self.chunk, max(lo, hi - 1) // self.chunk
        for ci in range(c0, min(c1 + 1 + self.readahead, self.n_chunks)):
            self._ensure(ci)
        parts = []
        for ci in range(c0, c1 + 1):
            arr = self._get(ci)
            a = max(0, lo - ci * self.chunk)
            b = min(len(arr), hi - ci * self.chunk)
            parts.append(arr[a:b])
        out = parts[0].copy() if len(parts) == 1 else np.concatenate(parts)
        # drop readahead state the reader has moved past; after the FINAL
        # chunk is served, clear everything — the trailing readahead futures
        # would otherwise pin decoded chunks for the handle's lifetime
        if c1 + 1 >= self.n_chunks:
            self._futures.clear()
            self._cache.clear()
        else:
            for ci in [k for k in self._futures if k < c0]:
                self._futures.pop(ci, None)
        return out


class ParallelGzipAppender:
    """Append rows to a gzip-chunked dataset, compressing full chunks on the
    shared thread pool and committing them with ``write_direct_chunk``.

    Appends must be sequential (they are: add_rows streams front-to-back).
    The trailing partial chunk goes through the normal filter pipeline at
    ``finalize()``."""

    def __init__(self, ds: h5py.Dataset, level: int, max_inflight: int = 16):
        self.ds = ds
        self.chunk = int(ds.chunks[0])
        self.level = int(level)
        self.row0 = 0                       # absolute row of buf[0]
        self.buf: List[np.ndarray] = []
        self.buffered = 0
        self.pending: deque = deque()       # (chunk_offset, future)
        self.max_inflight = max_inflight

    def append(self, rows: np.ndarray) -> None:
        self.buf.append(rows)
        self.buffered += rows.shape[0]
        while self.buffered >= self.chunk:
            block = np.concatenate(self.buf) if len(self.buf) > 1 else self.buf[0]
            full, rest = block[:self.chunk], block[self.chunk:]
            data = full.tobytes()
            self.pending.append((self.row0, _gzip_pool().submit(
                zlib.compress, data, self.level)))
            self.row0 += self.chunk
            self.buf = [rest] if rest.shape[0] else []
            self.buffered = rest.shape[0]
            while len(self.pending) > self.max_inflight:
                self._commit_one()

    def _commit_one(self) -> None:
        off, fut = self.pending.popleft()
        self.ds.id.write_direct_chunk((off,), fut.result(), filter_mask=0)

    def drain(self) -> None:
        while self.pending:
            self._commit_one()

    def checkpoint(self) -> None:
        """Persist everything added so far WITHOUT retiring the appender: the
        buffered partial chunk is slice-written through the regular filter
        pipeline into the chunk at row0 (chunk-aligned), which the later
        write_direct_chunk for the completed chunk simply overwrites. Makes
        H5Output.flush() a real durability point for crash/monitor readers."""
        self.drain()
        if self.buffered:
            tail = np.concatenate(self.buf) if len(self.buf) > 1 else self.buf[0]
            self.ds[self.row0:self.row0 + tail.shape[0]] = tail

    def finalize(self) -> None:
        self.checkpoint()
        self.row0 += self.buffered
        self.buf, self.buffered = [], 0


class H5FileHandler(h5py.File):
    """h5py.File wrapper that reports which file failed to open
    (ref: src/utils/HDF5Utils.py:1-11)."""

    def __init__(self, path: str, mode: str = "r", **kwargs):
        try:
            super().__init__(path, mode, **kwargs)
        except OSError as e:
            raise OSError(f"failed to open HDF5 file '{path}' (mode={mode}): {e}") from e


class H5Base:
    def __init__(self, path: str, access: str = "r", **kwargs):
        self.path = path
        self.h5f = H5FileHandler(path, access, **kwargs)

    def close(self) -> None:
        self.h5f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class H5Input(H5Base):
    """Sequential chunked reader over one table, never splitting an event
    across chunks (ref: HDF5IO.py:24-79)."""

    def __init__(self, path: str, **kwargs):
        super().__init__(path, **kwargs)
        self.record_type: Optional[np.dtype] = None
        self.table_name = ""
        self.table: Optional[h5py.Dataset] = None
        self.event_index_name = ""
        self.event_index_coord: Optional[int] = None
        self.current_index = -1  # -1: fresh, -2: exhausted (next call resets)
        self.table_length = 0
        self._par: Optional[ParallelChunkReader] = None

    def setup_table(self, name: str, data_type: np.dtype, event_index_name: str,
                    event_index_coord: Optional[int] = None, base: str = "/") -> None:
        self.record_type = data_type
        self.table_name = name
        self.table = self.h5f[base + name]
        self.table_length = self.table.shape[0]
        self.event_index_name = event_index_name
        self.event_index_coord = event_index_coord
        self.current_index = -1
        # gzip-chunked tables (the analysis chain's layout) decode on the
        # shared thread pool with readahead; others use plain slicing
        self._par = (ParallelChunkReader(self.table)
                     if _gzip_only_dataset(self.table) else None)

    def _read(self, lo: int, hi: int) -> np.ndarray:
        if self._par is not None:
            return self._par.read(lo, hi)
        return self.table[lo:hi]

    def _event_numbers(self, rows: np.ndarray) -> np.ndarray:
        col = rows[self.event_index_name]
        if self.event_index_coord is not None and col.ndim > 1:
            col = col[:, self.event_index_coord]
        return col

    def get_event_number(self, row: np.ndarray):
        if self.event_index_coord is None:
            return row[self.event_index_name]
        return row[self.event_index_name][self.event_index_coord]

    def next_chunk(self, nrows: int = 2048,
                   preserve_event="extend") -> Optional[np.ndarray]:
        """Read the next ~nrows rows with whole events per chunk. Returns
        None once after exhaustion, then restarts
        (ref: HDF5IO.py:55-79 state machine).

        preserve_event modes (both keep every event intact in one chunk):
        - True / "extend": grow the chunk until the final event completes —
          the reference's semantics. Chunks are nrows + a few rows.
        - "truncate": cut BACK to the last complete event boundary, so
          chunks are nrows − a few rows. On a static-shape device this is
          the right mode: an nrows+ε chunk pads to the NEXT bucket (e.g.
          4097 rows → 6144-row bucket = 50% wasted transfer + FLOPs), while
          nrows−ε pads to nrows exactly. Falls back to extend when a single
          event spans the whole read.
        - False: raw nrows slices (events may split across chunks).
        """
        if self.table is None:
            raise RuntimeError("No table opened!")
        if self.current_index == -2:
            self.current_index = -1
            return None
        if self.current_index == -1:
            self.current_index = 0
        if self.current_index + nrows >= self.table_length:
            ci = self.current_index
            self.current_index = -2
            return self._read(ci, self.table_length)
        data = self._read(self.current_index, self.current_index + nrows)
        self.current_index += nrows
        if preserve_event == "truncate":
            evts = self._event_numbers(data)
            last_event = evts[-1]
            first_of_last = int(np.argmax(evts == last_event))
            if first_of_last > 0:
                self.current_index -= data.shape[0] - first_of_last
                return data[:first_of_last]
            # whole read is one event: extend until it completes
            preserve_event = True
        if preserve_event:
            last_event = self.get_event_number(data[-1])
            # block-read extension: pull ahead in chunks and cut at the first
            # row whose event id differs (vectorized vs ref's per-row loop)
            ext_block = max(64, nrows // 8)
            while self.current_index < self.table_length:
                ahead = self._read(self.current_index,
                                   min(self.current_index + ext_block, self.table_length))
                evts = self._event_numbers(ahead)
                differs = np.nonzero(evts != last_event)[0]
                if differs.size:
                    take = int(differs[0])
                    if take:
                        data = np.concatenate([data, ahead[:take]])
                        self.current_index += take
                    break
                data = np.concatenate([data, ahead])
                self.current_index += len(ahead)
            if self.current_index >= self.table_length:
                self.current_index = -2
        return data

    def iter_chunks(self, nrows: int = 2048, preserve_event="extend"):
        """Generator over all chunks (one full pass)."""
        while True:
            chunk = self.next_chunk(nrows, preserve_event)
            if chunk is None:
                return
            yield chunk


class H5Output(H5Base):
    """Table writer with gzip compression and append-by-index semantics
    (ref: HDF5IO.py:82-131)."""

    def __init__(self, path: str):
        super().__init__(path, "w")
        self.tables: Dict[str, h5py.Dataset] = {}
        self.table_index: Dict[str, int] = {}
        self._appenders: Dict[str, ParallelGzipAppender] = {}

    def create_table(self, name: str, shape, data_type, compression: str = "gzip",
                     maxshape=(None,), compression_opts: int = 9, chunks=(1024,), **kwargs) -> None:
        self.tables[name] = self.h5f.create_dataset(
            name, shape=shape, dtype=data_type, compression=compression,
            maxshape=maxshape, compression_opts=compression_opts, chunks=chunks, **kwargs)
        self.table_index[name] = 0
        if _gzip_only_dataset(self.tables[name]):
            self._appenders[name] = ParallelGzipAppender(
                self.tables[name], level=int(compression_opts))

    def add_rows(self, name: str, rows: np.ndarray) -> None:
        i = self.table_index[name]
        tbl = self.tables[name]
        if i + rows.shape[0] > tbl.shape[0]:
            app = self._appenders.get(name)
            if app is not None:
                app.drain()  # committed chunks stay valid through a resize
            tbl.resize((i + rows.shape[0],))
        app = self._appenders.get(name)
        # the direct-chunk path stores rows.tobytes() verbatim, so it is only
        # valid when the in-memory dtype IS the dataset dtype; mismatches fall
        # back to h5py slicing, which converts per-field
        if app is not None and app.row0 + app.buffered == i \
                and rows.dtype == tbl.dtype:
            app.append(np.ascontiguousarray(rows))
        else:
            if app is not None:  # non-sequential/foreign writer: retire it
                self._finalize_table(name)
            tbl[i:i + rows.shape[0]] = rows
        self.table_index[name] = i + rows.shape[0]

    def _finalize_table(self, name: str) -> None:
        app = self._appenders.pop(name, None)
        if app is not None:
            app.finalize()

    def close_table(self, name: str) -> None:
        self._finalize_table(name)
        self.table_index.pop(name)
        self.tables.pop(name)

    def flush(self, table: Optional[str] = None) -> None:
        if table is not None:
            # scoped flush: a table without a live appender (plain table, or
            # appender already retired) has nothing extra to checkpoint
            apps = [self._appenders[table]] if table in self._appenders else []
        else:
            apps = list(self._appenders.values())
        for app in apps:
            app.checkpoint()  # incl. the buffered partial chunk
        self.h5f.flush()

    def close(self) -> None:
        for name in list(self._appenders):
            self._finalize_table(name)
        super().close()

    def copy_attrs(self, table: str, h5input: H5Base, input_table: str,
                   names: Sequence[str], types: Sequence[Any], shapes: Sequence[Any]) -> None:
        src_attrs = h5input.h5f[input_table].attrs
        for n, t, s in zip(names, types, shapes):
            if n not in src_attrs.keys():
                continue
            kwargs = {}
            if t is not None:
                kwargs["dtype"] = t
            if s is not None:
                kwargs["shape"] = s
            self.tables[table].attrs.create(n, src_attrs[n], **kwargs)

    def copy_table(self, name: str, h5input: H5Base) -> None:
        src = h5input.h5f[name]
        self.create_table(name, src.shape, src.dtype)
        if src.shape[0] > 0:
            self.tables[name][...] = src[()]
            self.table_index[name] = src.shape[0]


def _fixed_str_type(length: int) -> Datatype:
    tid = h5t.C_S1.copy()
    tid.set_size(length)
    return Datatype(tid)


class P2XTableWriter(H5Output):
    """Writer that mirrors the experiment's PyTables attribute conventions
    (ref: HDF5IO.py:134-206)."""

    def copy_chanmap(self, h5input: H5Base) -> None:
        self.copy_table("Chanmap", h5input)
        self.copy_p2x_attrs(h5input, "Chanmap", "Chanmap")

    def _attr_str_type(self, h5input: H5Base, table: str, name: str) -> Optional[Datatype]:
        attrs = h5input.h5f[table].attrs
        if name in attrs.keys():
            return _fixed_str_type(len(attrs[name]) + 1)
        return None

    def write_field_names(self, table: str, dtype_names: Sequence[str]) -> None:
        """Write FIELD_n_NAME attrs for a new table's fields."""
        for n, name in enumerate(dtype_names):
            self.tables[table].attrs.create(
                f"FIELD_{n}_NAME", name, dtype=_fixed_str_type(len(name) + 1))

    def copy_p2x_attrs(self, h5input: H5Base, table: str, input_table: str,
                       dtype_names: Optional[Sequence[str]] = None) -> None:
        names: List[str] = ["CLASS"]
        shapes: List[Any] = [None]
        types: List[Any] = [_fixed_str_type(6)]
        src_attrs = h5input.h5f[input_table].attrs
        if dtype_names is not None:
            self.write_field_names(table, dtype_names)
        else:
            n = 0
            while f"FIELD_{n}_NAME" in src_attrs.keys():
                key = f"FIELD_{n}_NAME"
                names.append(key)
                shapes.append(None)
                types.append(_fixed_str_type(len(src_attrs[key]) + 1))
                n += 1
        for key in ("TITLE", "VERSION"):
            if key in src_attrs.keys():
                names.append(key)
                shapes.append(None)
                types.append(_fixed_str_type(len(src_attrs[key]) + 1))
        for key in ("abstime", "runtime"):
            names.append(key)
            shapes.append((1,))
            types.append(np.float64)
        for key in ("calgrp", "rname"):
            t = self._attr_str_type(h5input, input_table, key)
            if t is not None:
                names.append(key)
                types.append(t)
                shapes.append(None)
        for key in ("nevents", "scalingfactor"):
            names.append(key)
            shapes.append((1,))
            types.append(np.float64)
        self.copy_attrs(table, h5input, input_table, names, types, shapes)


def _bench_chunk_read(path: str, rows_per_read: int = 2048) -> float:
    """Chunk-read throughput micro-benchmark (the reference's unrecorded
    HDF5IO.test1/test2 timeit at 2048 vs 8192 rows/read — ref :234-278).
    Returns seconds to stream the whole file."""
    import time

    from waveformml_tpu.io.compound_types import extension_type_map

    t = extension_type_map(path)
    inp = H5Input(path)
    inp.setup_table(t.name, t.type, t.event_index_name,
                    event_index_coord=t.event_index_coord)
    t0 = time.perf_counter()
    n = 0
    for chunk in inp.iter_chunks(rows_per_read):
        n += chunk.shape[0]
    dt = time.perf_counter() - t0
    inp.close()
    print(f"{path}: {n} rows at {rows_per_read} rows/read in {dt:.3f}s "
          f"({n / max(dt, 1e-9):,.0f} rows/s)")
    return dt


if __name__ == "__main__":
    import sys

    for r in (2048, 8192):
        _bench_chunk_read(sys.argv[1], r)
