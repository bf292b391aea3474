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
