import jax
import jax.numpy as jnp
import numpy as np

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.ops.sparse import (
    SparseBatch, bucket_size, consecutive_event_index, event_multiplicity,
    gather_from_dense, gen_SE_mask, gen_multiplicity_list, normalize_waveforms,
    occupancy_mask, pad_sparse, retrieve_n_SE, scatter_to_dense,
    segment_mean_loss, swap_sparse_from_dense, swap_sparse_from_event,
)


def _make_batch(rng, n_real=10, n_pad=16, n_events=4, n_feat=5):
    coords = np.stack([
        rng.integers(0, NX, n_real),
        rng.integers(0, NY, n_real),
        np.sort(rng.integers(0, n_events, n_real)),
    ], axis=1).astype(np.int32)
    # dedup sites within an event so scatter-add == scatter-set
    seen, keep = set(), []
    for i, c in enumerate(coords):
        k = tuple(c)
        if k not in seen:
            seen.add(k)
            keep.append(i)
    coords = coords[keep]
    feats = rng.normal(size=(coords.shape[0], n_feat)).astype(np.float32)
    c, f, m = pad_sparse(coords, feats, n_pad)
    return SparseBatch(jnp.array(c), jnp.array(f), jnp.array(m), n_events), coords, feats


def test_scatter_gather_roundtrip(rng):
    batch, coords, feats = _make_batch(rng)
    dense = scatter_to_dense(batch)
    assert dense.shape == (4, NX, NY, 5)
    # dense holds features at their sites
    for i, (x, y, e) in enumerate(coords):
        np.testing.assert_allclose(np.asarray(dense[e, x, y]), feats[i], rtol=1e-6)
    # gather returns them
    back = gather_from_dense(dense, batch)
    np.testing.assert_allclose(np.asarray(back[: len(coords)]), feats, rtol=1e-6)
    # padding rows gather zero
    assert np.all(np.asarray(back[len(coords):]) == 0)


def test_occupancy_mask(rng):
    batch, coords, _ = _make_batch(rng)
    occ = np.asarray(occupancy_mask(batch))
    expect = np.zeros((4, NX, NY), dtype=bool)
    for x, y, e in coords:
        expect[e, x, y] = True
    np.testing.assert_array_equal(occ, expect)


def test_event_multiplicity(rng):
    batch, coords, _ = _make_batch(rng)
    mult = np.asarray(event_multiplicity(batch))
    expect = np.bincount(coords[:, 2], minlength=4)
    np.testing.assert_array_equal(mult, expect)


def test_segment_mean_loss():
    loss = jnp.array([1.0, 2.0, 3.0, 100.0])
    mask = jnp.array([True, True, True, False])
    assert float(segment_mean_loss(loss, mask)) == 2.0


def test_scatter_jit_stable(rng):
    batch, _, _ = _make_batch(rng)
    f = jax.jit(lambda b: scatter_to_dense(b).sum())
    v1 = f(batch)
    v2 = f(batch)
    assert np.allclose(v1, v2)


def test_bucket_size():
    assert bucket_size(100) == 256
    assert bucket_size(256) == 256
    assert bucket_size(257) == 384
    assert bucket_size(385) == 512
    assert bucket_size(12289) == 16384
    assert bucket_size(100000) == 131072


# -- host-side writer-path kernels (ref: SparseUtils.py:1459-1584) ---------------

def test_consecutive_event_index():
    ev = np.array([5, 5, 9, 9, 9, 2, 7, 7])
    np.testing.assert_array_equal(consecutive_event_index(ev), [0, 0, 1, 1, 1, 2, 3, 3])


def test_swap_sparse_from_dense():
    coords = np.array([[1, 2, 10], [3, 4, 10], [0, 0, 12]], dtype=np.int32)
    dense = np.zeros((2, NX, NY), dtype=np.float32)
    dense[0, 1, 2] = 7.0
    dense[0, 3, 4] = 8.0
    dense[1, 0, 0] = 9.0
    out = np.zeros(3, dtype=np.float32)
    swap_sparse_from_dense(out, dense, coords)
    np.testing.assert_array_equal(out, [7, 8, 9])


def test_swap_sparse_from_event():
    coords = np.array([[0, 0, 3], [1, 1, 3], [2, 2, 8]], dtype=np.int32)
    out = np.zeros(3)
    swap_sparse_from_event(out, np.array([1.5, 2.5]), coords)
    np.testing.assert_array_equal(out, [1.5, 1.5, 2.5])


def test_gen_multiplicity_list_per_row():
    ev = np.array([0, 0, 0, 4, 4, 9])
    np.testing.assert_array_equal(gen_multiplicity_list(ev), [3, 3, 3, 2, 2, 1])


def test_se_mask_and_n_se():
    seg_status = np.zeros((NX, NY))
    seg_status[1, 1] = 0.5
    seg_status[2, 2] = 1.0  # dead
    coords = np.array([[1, 1, 0], [2, 2, 0], [0, 0, 1], [1, 1, 1]], dtype=np.int32)
    np.testing.assert_array_equal(gen_SE_mask(coords, seg_status), [1, 0, 0, 1])
    np.testing.assert_array_equal(retrieve_n_SE(coords, seg_status), [1, 1, 1, 1])


def test_normalize_waveforms_and_renumber():
    gains = np.full((NX, NY, 2), 2.0)
    gains[0, 0, 1] = 4.0
    coords = np.array([[0, 0, 7], [1, 1, 9]], dtype=np.int32)
    wf = np.array([[100, 200, 300, 400], [10, 20, 30, 40]], dtype=np.int16)
    out = normalize_waveforms(coords, wf, gains)
    np.testing.assert_allclose(out[0], [200, 400, 1200, 1600])
    np.testing.assert_allclose(out[1], [20, 40, 60, 80])
    np.testing.assert_array_equal(coords[:, 2], [0, 1])
