import numpy as np

from waveformml_tpu.io.compound_types import WaveformPairNorm
from waveformml_tpu.io.hdf5 import H5Input, H5Output, P2XTableWriter


def _write_test_file(path, n=100, n_events=20, rng=None):
    rng = rng or np.random.default_rng(0)
    t = WaveformPairNorm()
    data = t.generate_random_data(n, rng)
    # monotone event ids with ragged event sizes
    ev = np.sort(rng.integers(0, n_events, n))
    data["coord"][:, 2] = ev
    out = H5Output(str(path))
    out.create_table("WaveformPairNorm", (n,), t.type)
    out.add_rows("WaveformPairNorm", data)
    out.tables["WaveformPairNorm"].attrs.create("nevents", float(n_events), shape=(1,))
    out.tables["WaveformPairNorm"].attrs.create("TITLE", b"test table")
    out.tables["WaveformPairNorm"].attrs.create("VERSION", b"3.0")
    out.tables["WaveformPairNorm"].attrs.create("CLASS", b"TABLE")
    out.tables["WaveformPairNorm"].attrs.create("abstime", 1.0, shape=(1,))
    out.tables["WaveformPairNorm"].attrs.create("runtime", 2.0, shape=(1,))
    out.flush()
    out.close()
    return data


def test_next_chunk_preserves_events(tmp_path):
    p = tmp_path / "x_WFNorm.h5"
    data = _write_test_file(p, n=100)
    t = WaveformPairNorm()
    inp = H5Input(str(p))
    inp.setup_table("WaveformPairNorm", t.type, "coord", 2)
    chunks, total = [], 0
    while True:
        c = inp.next_chunk(nrows=17, preserve_event=True)
        if c is None:
            break
        chunks.append(c)
        total += len(c)
    assert total == 100
    # no event straddles a chunk boundary
    for a, b in zip(chunks[:-1], chunks[1:]):
        assert a["coord"][-1, 2] != b["coord"][0, 2]
    # concatenation reproduces the file exactly
    cat = np.concatenate(chunks)
    np.testing.assert_array_equal(cat["pulse"], data["pulse"])
    inp.close()


def test_next_chunk_truncate_mode(tmp_path):
    """preserve_event="truncate": chunks never EXCEED nrows (an nrows+eps
    chunk pads to the next static-shape bucket — 50% wasted transfer), events
    stay whole, coverage is exact, and a single whole-read event falls back
    to extend."""
    p = tmp_path / "x_WFNorm.h5"
    data = _write_test_file(p, n=100)
    t = WaveformPairNorm()
    inp = H5Input(str(p))
    inp.setup_table("WaveformPairNorm", t.type, "coord", 2)
    chunks = list(inp.iter_chunks(nrows=17, preserve_event="truncate"))
    inp.close()
    assert all(len(c) <= 17 for c in chunks[:-1])
    for a, b in zip(chunks[:-1], chunks[1:]):
        assert a["coord"][-1, 2] != b["coord"][0, 2]
    cat = np.concatenate(chunks)
    np.testing.assert_array_equal(cat["pulse"], data["pulse"])

    # one event spanning the whole read: truncate must extend, not loop/empty
    _write_test_file(tmp_path / "y_WFNorm.h5", n=60)
    import h5py

    with h5py.File(tmp_path / "y_WFNorm.h5", "r+") as f:
        rows = f["WaveformPairNorm"][...]
        rows["coord"][:, 2] = 7  # every row the same event id
        f["WaveformPairNorm"][...] = rows
    inp = H5Input(str(tmp_path / "y_WFNorm.h5"))
    inp.setup_table("WaveformPairNorm", t.type, "coord", 2)
    chunks = list(inp.iter_chunks(nrows=10, preserve_event="truncate"))
    inp.close()
    assert sum(len(c) for c in chunks) == 60
    assert len(chunks[0]) == 60  # extended through the single event


def test_next_chunk_restarts_after_none(tmp_path):
    p = tmp_path / "x_WFNorm.h5"
    _write_test_file(p, n=50)
    t = WaveformPairNorm()
    inp = H5Input(str(p))
    inp.setup_table("WaveformPairNorm", t.type, "coord", 2)
    n1 = sum(len(c) for c in inp.iter_chunks(nrows=16))
    n2 = sum(len(c) for c in inp.iter_chunks(nrows=16))
    assert n1 == n2 == 50
    inp.close()


def test_p2x_attr_copying(tmp_path):
    src_path = tmp_path / "src_WFNorm.h5"
    _write_test_file(src_path, n=30)
    t = WaveformPairNorm()
    inp = H5Input(str(src_path))
    out_path = tmp_path / "out_WFNorm.h5"
    w = P2XTableWriter(str(out_path))
    w.create_table("WaveformPairNorm", (30,), t.type)
    w.copy_p2x_attrs(inp, "WaveformPairNorm", "WaveformPairNorm", dtype_names=t.names)
    attrs = w.tables["WaveformPairNorm"].attrs
    assert attrs["CLASS"] == b"TABLE"
    assert attrs["FIELD_0_NAME"] == b"t"
    assert attrs["FIELD_2_NAME"] == b"pulse"
    assert float(attrs["nevents"][0]) == 20.0
    w.close()
    inp.close()


def test_add_rows_resizes(tmp_path):
    t = WaveformPairNorm()
    out = H5Output(str(tmp_path / "grow.h5"))
    out.create_table("T", (10,), t.type)
    d = t.generate_random_data(25, np.random.default_rng(0))
    out.add_rows("T", d[:10])
    out.add_rows("T", d[10:])
    assert out.tables["T"].shape[0] == 25
    out.close()


def test_parallel_gzip_appender_round_trip(tmp_path):
    """gzip-chunked tables are written through write_direct_chunk with the
    deflate running on a thread pool; the bytes on disk must read back
    identically through plain h5py (same deflate filter format)."""
    import h5py

    from waveformml_tpu.io.compound_types import WaveformPairCal

    rng = np.random.default_rng(1)
    t = WaveformPairCal()
    n = 3333  # 3 full 1024-chunks + a 261-row tail
    data = t.generate_random_data(n, rng)
    p = tmp_path / "gz.h5"
    out = H5Output(str(p))
    out.create_table("T", (n,), t.type, compression="gzip",
                     compression_opts=4, chunks=(1024,))
    assert "T" in out._appenders
    # ragged appends that straddle chunk boundaries
    i, sizes = 0, [100, 924, 1, 1023, 1285]
    for s in sizes:
        out.add_rows("T", data[i:i + s])
        i += s
    out.add_rows("T", data[i:])
    out.close()
    with h5py.File(p) as f:
        back = f["T"][()]
        assert f["T"].compression == "gzip"
    np.testing.assert_array_equal(back, data)


def test_parallel_gzip_appender_resize_and_fallback(tmp_path):
    import h5py

    rng = np.random.default_rng(2)
    dt = np.dtype([("a", np.int32), ("b", np.float32)])
    data = np.zeros(2600, dtype=dt)
    data["a"] = rng.integers(0, 1000, 2600)
    data["b"] = rng.random(2600, dtype=np.float32)
    p = tmp_path / "gz2.h5"
    out = H5Output(str(p))
    out.create_table("T", (1000,), dt, compression="gzip",
                     compression_opts=4, chunks=(1024,))
    out.add_rows("T", data[:2048])  # forces a resize past the initial shape
    out.add_rows("T", data[2048:])
    out.close()
    with h5py.File(p) as f:
        np.testing.assert_array_equal(f["T"][()], data)

    # non-sequential writer retires the appender but loses nothing
    p2 = tmp_path / "gz3.h5"
    out = H5Output(str(p2))
    out.create_table("T", (2600,), dt, compression="gzip",
                     compression_opts=4, chunks=(1024,))
    out.add_rows("T", data[:1500])
    out.table_index["T"] = 1400  # simulate an out-of-band rewind
    out.add_rows("T", data[1400:])
    out.close()
    with h5py.File(p2) as f:
        np.testing.assert_array_equal(f["T"][()], data)


def test_parallel_chunk_reader_matches_plain_slicing(tmp_path):
    """H5Input over a gzip-chunked table (threaded direct-chunk decode) must
    yield byte-identical chunks to the same table stored uncompressed."""
    import h5py

    from waveformml_tpu.io.compound_types import WaveformPairCal
    from waveformml_tpu.io.hdf5 import ParallelChunkReader, _gzip_only_dataset

    rng = np.random.default_rng(3)
    t = WaveformPairCal()
    n = 2500
    data = t.generate_random_data(n, rng)
    data["coord"][:, 2] = np.sort(rng.integers(0, 400, n))
    gz, plain = tmp_path / "gz.h5", tmp_path / "plain.h5"
    with h5py.File(gz, "w") as f:
        f.create_dataset("WaveformPairCal", data=data, chunks=(1024,),
                         compression="gzip", compression_opts=4)
    with h5py.File(plain, "w") as f:
        f.create_dataset("WaveformPairCal", data=data)

    readers = {}
    for name, path in (("gz", gz), ("plain", plain)):
        inp = H5Input(str(path))
        inp.setup_table("WaveformPairCal", t.type, "coord", 2)
        readers[name] = inp
    assert readers["gz"]._par is not None
    assert readers["plain"]._par is None
    while True:
        a = readers["gz"].next_chunk(nrows=700, preserve_event=True)
        b = readers["plain"].next_chunk(nrows=700, preserve_event=True)
        assert (a is None) == (b is None)
        if a is None:
            break
        np.testing.assert_array_equal(a, b)
    for r in readers.values():
        r.close()

    # random-access read() equals slicing, including the ragged tail chunk
    with h5py.File(gz) as f:
        pr = ParallelChunkReader(f["WaveformPairCal"])
        assert _gzip_only_dataset(f["WaveformPairCal"])
        for lo, hi in ((0, 1), (1000, 1048), (2400, 2500), (0, 2500), (2499, 2500)):
            np.testing.assert_array_equal(pr.read(lo, hi), data[lo:hi])
        # returned arrays must be writable (writers mutate EZ in place)
        chunk = pr.read(10, 20)
        chunk["EZ"][:, 1] = 1.0


def test_flush_persists_partial_chunk_and_appends_continue(tmp_path):
    """H5Output.flush() must be a durability point even for gzip-appender
    tables: the buffered partial chunk is visible to a concurrent reader
    after flush, and later appends still complete the chunk correctly."""
    import h5py

    rng = np.random.default_rng(4)
    dt = np.dtype([("a", np.int32), ("b", np.float32)])
    data = np.zeros(2600, dtype=dt)
    data["a"] = rng.integers(0, 1000, 2600)
    data["b"] = rng.random(2600, dtype=np.float32)
    p = tmp_path / "fl.h5"
    out = H5Output(str(p))
    out.create_table("T", (2600,), dt, compression="gzip",
                     compression_opts=4, chunks=(1024,))
    out.add_rows("T", data[:1500])  # 1 full chunk + 476-row buffered tail
    out.flush()
    # byte-copy the flushed file: what a crash/monitor reader would see
    snap = tmp_path / "fl_snapshot.h5"
    snap.write_bytes(p.read_bytes())
    with h5py.File(snap, "r") as f:
        np.testing.assert_array_equal(f["T"][:1500], data[:1500])
    out.add_rows("T", data[1500:])  # appender must still be live + correct
    assert "T" in out._appenders
    out.close()
    with h5py.File(p) as f:
        np.testing.assert_array_equal(f["T"][()], data)


def test_add_rows_dtype_mismatch_falls_back_to_slicing(tmp_path):
    """Rows whose in-memory dtype differs from the table dtype must NOT go
    through the raw tobytes() direct-chunk path (it would reinterpret bytes);
    they retire the appender and write through h5py's converting slice."""
    import h5py

    rng = np.random.default_rng(5)
    dt32 = np.dtype([("a", np.int32), ("b", np.float32)])
    dt64 = np.dtype([("a", np.int64), ("b", np.float64)])
    data = np.zeros(1600, dtype=dt64)
    data["a"] = rng.integers(0, 1000, 1600)
    data["b"] = rng.random(1600)
    p = tmp_path / "conv.h5"
    out = H5Output(str(p))
    out.create_table("T", (1600,), dt32, compression="gzip",
                     compression_opts=4, chunks=(1024,))
    out.add_rows("T", data[:800].astype(dt32))   # fast path
    out.add_rows("T", data[800:1200])            # foreign dtype -> fallback
    out.add_rows("T", data[1200:].astype(dt32))  # plain slicing afterwards
    out.close()
    with h5py.File(p) as f:
        np.testing.assert_array_equal(f["T"][()], data.astype(dt32))
