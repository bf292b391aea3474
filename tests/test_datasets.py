import json
import os

import numpy as np
import pytest

from waveformml_tpu.config import Config
from waveformml_tpu.datasets.data_module import PSDDataModule, collate_blocks
from waveformml_tpu.datasets.hdf5_dataset import HDF5Dataset
from waveformml_tpu.datasets.pulse_dataset import PulseDataset2D
from waveformml_tpu.datasets.synthetic import write_classification_dirs

N_SAMPLES = 16


@pytest.fixture
def data_dirs(tmp_path):
    base = tmp_path / "data"
    return write_classification_dirs(
        str(base), ["TypeA", "TypeB"], n_files=3, events_per_file=20,
        n_samples=N_SAMPLES, seed=7)


def _config(tmp_path, n_train=30, n_validate=10, n_test=10, **dataset_extra):
    d = {
        "run_config": {"exp_name": "t", "run_class": "LitPSD",
                       "imports": ["waveformml_tpu.engineering"]},
        "system_config": {"model_name": "m", "n_samples": N_SAMPLES,
                          "n_type": 2, "type_names": ["TypeA", "TypeB"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet", "net_type": "2DConvolution"},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [],
                            "optimizer_class": "optim.SGD",
                            "optimizer_params": {"momentum": 0.9, "nesterov": True},
                            "scheduler_class": "lr_scheduler.ExponentialLR",
                            "scheduler_params": {"gamma": 0.9}},
        "dataset_config": {
            "mode": "path", "imports": [],
            "base_path": str(tmp_path / "data"),
            "paths": ["TypeA", "TypeB"],
            "dataset_class": "PulseDataset2D",
            "dataset_params": {"data_cache_size": 2},
            "dataloader_params": {"batch_size": 2, "num_workers": 0},
            "n_train": n_train, "n_validate": n_validate, "n_test": n_test,
            **dataset_extra,
        },
    }
    return Config(d)


def test_hdf5_dataset_blocks(data_dirs, tmp_path):
    ds = HDF5Dataset([data_dirs["TypeA"], data_dirs["TypeB"]],
                     "*WaveformPairSim.h5", "WaveformPairs", "coord", "waveform",
                     events_per_dir=30, normalize=True)
    assert len(ds) >= 2
    block = ds[0]
    assert block.coords.shape[1] == 3
    assert block.feats.shape[1] == 2 * N_SAMPLES
    assert block.feats.dtype == np.float32
    # normalized to [0, 1]
    assert float(block.feats.max()) <= 1.0
    # dir-index labels: one per event
    n_events = len(np.unique(block.coords[:, 2]))
    assert block.labels.shape == (n_events,)
    assert set(np.unique(block.labels)) <= {0, 1}


def test_events_per_dir_cap(data_dirs):
    ds = HDF5Dataset([data_dirs["TypeA"]], "*WaveformPairSim.h5",
                     "WaveformPairs", "coord", "waveform", events_per_dir=25)
    total = sum(di["event_range"][1] - di["event_range"][0] + 1
                for di in ds.info["data_info"])
    assert total == 25
    # second block is truncated mid-file: check the row slice honors the range
    blocks = [ds[i] for i in range(len(ds))]
    got = sum(len(np.unique(b.coords[:, 2])) for b in blocks)
    assert got == 25


def test_label_map():
    # label remapping logic standalone (ref: HDF5Dataset.py:582-597)
    ds = HDF5Dataset.__new__(HDF5Dataset)
    ds.info = {"label_map": {1: 0, 4: 1, 6: 2}}
    y = np.array([1, 4, 6, 1])
    np.testing.assert_array_equal(ds.convert_label(y), [0, 1, 2, 0])


def test_collate_reoffsets_events(data_dirs):
    ds = HDF5Dataset([data_dirs["TypeA"], data_dirs["TypeB"]],
                     "*WaveformPairSim.h5", "WaveformPairs", "coord", "waveform",
                     events_per_dir=20)
    merged = collate_blocks([ds[0], ds[1]])
    ev = merged.coords[:, 2]
    # events renumbered consecutively from 0
    assert ev[0] == 0
    assert np.all(np.diff(ev) >= 0)
    n_events = ev[-1] + 1
    assert merged.labels.shape[0] == n_events
    assert len(np.unique(ev)) == n_events


def test_pulse_dataset2d_and_metadata(data_dirs, tmp_path):
    cfg = _config(tmp_path)
    ds = PulseDataset2D(cfg, "train", 20)
    block = ds[0]
    assert block.feats.shape[1] == 2 * N_SAMPLES
    # metadata JSON written (ref: PulseDataset.py:188-194)
    meta_files = [f for f in os.listdir(ds.dataset_dir) if f.endswith("_dataset.json")]
    assert meta_files
    meta = json.load(open(os.path.join(ds.dataset_dir, meta_files[0])))
    assert meta["data_name"] == "WaveformPairs"
    assert meta["dataset_config"]["dataset_class"] == "PulseDataset2D"
    # reload from metadata (ref: HDF5Dataset.py:62-85)
    ds2 = PulseDataset2D.retrieve_config(os.path.join(ds.dataset_dir, meta_files[0]))
    b2 = ds2[0]
    np.testing.assert_array_equal(b2.coords, block.coords)


def test_data_module_splits_dont_share_files(data_dirs, tmp_path):
    cfg = _config(tmp_path, n_train=20, n_validate=10, n_test=10)
    dm = PSDDataModule(cfg)
    dm.setup(None)
    train_files = set(dm.train_dataset.get_file_list())
    val_files = set(dm.val_dataset.get_file_list())
    test_files = set(dm.test_dataset.get_file_list())
    assert train_files.isdisjoint(val_files)
    assert train_files.isdisjoint(test_files)
    assert val_files.isdisjoint(test_files)


def test_data_module_loaders(data_dirs, tmp_path):
    cfg = _config(tmp_path, n_train=20, n_validate=10, n_test=10)
    dm = PSDDataModule(cfg)
    dm.setup(None)
    batches = list(dm.train_dataloader())
    assert batches
    for b in batches:
        assert b.coords.shape[0] == b.feats.shape[0]
    # prefetch-thread path produces the same batches
    cfg2 = _config(tmp_path, n_train=20, n_validate=10, n_test=10)
    cfg2.dataset_config.dataloader_params["num_workers"] = 2
    dm2 = PSDDataModule(cfg2)
    dm2.setup(None)
    batches2 = list(dm2.val_dataloader())
    batches1 = list(dm.val_dataloader())
    assert len(batches1) == len(batches2)
    for a, b in zip(batches1, batches2):
        np.testing.assert_array_equal(a.coords, b.coords)


def test_shuffle_pipeline(data_dirs, tmp_path):
    cfg = _config(tmp_path, n_train=40, data_prep="shuffle", shuffled_size=20)
    ds = PulseDataset2D(cfg, "train", 40)
    assert ds.shuffle_queue  # shuffle map generated
    ds.write_shuffled()
    combined = [f for f in os.listdir(ds.data_dir) if f.startswith("Combined_")
                and f.endswith(".h5")]
    assert combined
    # sidecar JSON exists per combined file
    for c in combined:
        assert os.path.exists(os.path.join(ds.data_dir, c[:-3] + ".json"))
    # dataset re-rooted at the combined dir; labels interleave classes
    block = ds[0]
    labels = block.labels
    assert set(np.unique(labels)) == {0, 1}
    # interleaved: first two events are different classes
    assert labels[0] != labels[1]
    # re-running the shuffle skips (superset sidecar) without error
    cfg2 = _config(tmp_path, n_train=40, data_prep="shuffle", shuffled_size=20)
    ds2 = PulseDataset2D(cfg2, "train", 40)
    ds2.write_shuffled()


def test_shuffle_preserves_event_content(data_dirs, tmp_path):
    """ValidateCombined-equivalent: every combined event's rows match some
    source event of the right class (ref: scripts/ValidateCombined.py:119-137)."""
    import h5py

    cfg = _config(tmp_path, n_train=40, data_prep="shuffle", shuffled_size=20)
    ds = PulseDataset2D(cfg, "train", 40)
    ds.write_shuffled()

    # collect source waveforms by class
    src = {0: [], 1: []}
    for k, name in enumerate(["TypeA", "TypeB"]):
        d = os.path.join(str(tmp_path / "data"), name)
        for f in sorted(os.listdir(d)):
            with h5py.File(os.path.join(d, f)) as h5:
                rec = h5["WaveformPairs"][()]
                src[k].append(rec["waveform"])
    src = {k: np.concatenate(v) for k, v in src.items()}

    combined = sorted(f for f in os.listdir(ds.data_dir)
                      if f.startswith("Combined_") and f.endswith(".h5"))
    for c in combined:
        with h5py.File(os.path.join(ds.data_dir, c)) as h5:
            g = h5["WaveformPairs"]
            coords = g["coord"][()]
            wf = g["waveform"][()]
            labels = g["labels"][()]
        ev = coords[:, 2]
        for e in np.unique(ev):
            rows = wf[ev == e]
            cls = int(labels[e])
            # each row of this event exists in the right class's source data
            for r in rows:
                assert (np.abs(src[cls] - r).sum(axis=1) < 1e-4).any()


@pytest.mark.parametrize("cls_name,fname,table,feat_field,n_feat,label", [
    ("PulseDatasetPMT", "f0_PMTCoordSim.h5", "DetPulseCoord", "pulse", 7, None),
    ("PulseDatasetDet", "f0_DetCoordSim.h5", "DetPulseCoord", "pulse", 7, None),
    ("PulseDataset2DWithZ", "f0_WaveformPairZSim.h5", "WaveformPairsWithZ",
     "waveform", 16, ("z", 1)),
    ("PulseDataset2DWithEZ", "f0_WaveformPairEZSim.h5", "WaveformPairsWithEZ",
     "waveform", 16, ("EZ", 2)),
    ("PulseDatasetDetWithZ", "f0_DetCoordZSim.h5", "DetPulseCoordWithZ",
     "pulse", 7, ("z", 1)),
    ("PulseDatasetDetWithEZ", "f0_DetCoordEZSim.h5", "DetPulseCoordWithEZ",
     "pulse", 7, ("EZ", 2)),
])
def test_remaining_pulse_dataset_variants(tmp_path, rng, cls_name, fname,
                                          table, feat_field, n_feat, label):
    """Every registered PulseDataset variant loads its on-disk layout
    (ref: PulseDataset.py:628-903): PMT/Det phys-pulse coords and the
    WithZ/WithEZ labelled waveform tables."""
    import h5py

    from waveformml_tpu.config import Config
    from waveformml_tpu.registry import retrieve_class

    d = tmp_path / "data" / "a"
    os.makedirs(d)
    n = 30
    fields = [("coord", np.int32, (3,)), (feat_field, np.float32, (n_feat,))]
    if label is not None and label[1] == 1:
        fields.append((label[0], np.float32))
    elif label is not None:
        fields.append((label[0], np.float32, (label[1],)))
    rec = np.zeros(n, dtype=np.dtype(fields))
    rec["coord"][:, 0] = rng.integers(0, 14, n)
    rec["coord"][:, 1] = rng.integers(0, 11, n)
    rec["coord"][:, 2] = np.sort(rng.integers(0, 10, n))
    rec[feat_field] = rng.random((n, n_feat), dtype=np.float32)
    if label is not None:
        rec[label[0]] = (rng.random(n, dtype=np.float32) if label[1] == 1
                         else rng.random((n, label[1]), dtype=np.float32))
    with h5py.File(str(d / fname), "w") as h5:
        h5.create_dataset(table, data=rec)
        h5[table].attrs.create("nevents", np.array([10.0]))

    cfg = Config({
        "system_config": {"model_name": "m", "n_samples": 8,
                          "model_base_path": str(tmp_path / "model"),
                          "type_names": ["a"]},
        "dataset_config": {"base_path": str(tmp_path / "data"), "paths": ["a"],
                           "dataset_params": {}},
    })
    ds = retrieve_class(cls_name)(cfg, "train", 10)
    block = ds[0]
    assert block.coords.shape[1] == 3
    assert block.feats.shape[1] == n_feat
    if label is not None:
        assert block.labels is not None and block.labels.shape[0] == block.coords.shape[0]
    if cls_name == "PulseDatasetPMT":
        # per-feature normalization vector applied (ref :628-676)
        assert block.feats.max() <= 1.0 + 1e-6


def test_combine_data_type_map_resolves():
    """Every CombineData -t choice maps to a registered dataset class
    (ref: CombineData.py:6)."""
    import CombineData
    from waveformml_tpu.registry import retrieve_class

    assert set(CombineData.TYPE_MAP) == {"2d", "3d", "pmt", "det", "detz",
                                         "detez", "2dz", "2dez", "wfpair",
                                         "wfpairez"}
    for cls_name in CombineData.TYPE_MAP.values():
        assert retrieve_class(cls_name) is not None


def test_superset_rejects_unknown_source_file(tmp_path):
    """A source file absent from the sidecar must invalidate the combined
    cache (the reference's loop falls through silently there)."""
    from waveformml_tpu.datasets.pulse_dataset import _file_config_superset

    sidecar = tmp_path / "Combined_0.json"
    with open(sidecar, "w") as f:
        json.dump({"0": [["a.h5", [0, 9], 123.0]]}, f)
    # same file, covered range: superset
    assert _file_config_superset({0: [["a.h5", [0, 5], 123.0]]}, str(sidecar))
    # new file the sidecar has never seen: NOT a superset
    assert not _file_config_superset(
        {0: [["a.h5", [0, 5], 123.0], ["b.h5", [0, 5], 50.0]]}, str(sidecar))


def test_shuffle_dir_index_labels_not_double_mapped(data_dirs, tmp_path):
    """Group-layout combined files store FINAL class indices (the directory
    index), and the unshuffled path never applies label_map to
    directory-index labels — so the post-shuffle re-init must drop
    label_map, or training after a shuffle silently remaps/swaps classes
    relative to training without one."""
    cfg = _config(tmp_path, n_train=40, data_prep="shuffle", shuffled_size=20)
    unshuffled = PulseDataset2D(_config(tmp_path, n_train=40), "train", 40)
    unshuffled.info["label_map"] = {0: 1, 1: 0}
    before = set(np.unique(unshuffled[0].labels))
    assert before <= {0, 1}  # dir-index labels ignore label_map unshuffled

    ds = PulseDataset2D(cfg, "train", 40)
    ds.info["label_map"] = {0: 1, 1: 0}  # as if label_map had been configured
    ds.write_shuffled()
    assert ds.info["label_map"] is None  # dropped: labels already final
    labels = np.concatenate([ds[i].labels for i in range(len(ds))])
    assert set(np.unique(labels)) == {0, 1}


def test_sort_pattern_mixed_names():
    from waveformml_tpu.datasets.hdf5_dataset import _sort_pattern

    names = ["run_2_x.h5", "plain.h5", "run_10_x.h5", "other.h5"]
    ordered = sorted(names, key=_sort_pattern)
    assert ordered == ["run_2_x.h5", "run_10_x.h5", "other.h5", "plain.h5"]


def test_dataset_construction_through_symlinked_root(data_dirs, tmp_path):
    """Configured paths that traverse a symlink must still resolve each
    file's directory index (abspath vs resolve mismatch)."""
    link = tmp_path / "linkdata"
    os.symlink(tmp_path / "data", link)
    ds = HDF5Dataset([str(link / "TypeA"), str(link / "TypeB")],
                     "*WaveformPairSim.h5", "WaveformPairs", "coord",
                     "waveform", events_per_dir=30)
    dir_idx = {di["dir_index"] for di in ds.info["data_info"]}
    assert dir_idx == {0, 1}


def test_data_module_train_only_config_test_fallback(data_dirs, tmp_path):
    """A config with neither n_validate nor n_test must not crash setup():
    the validation/test splits fall back instead."""
    cfg = _config(tmp_path, n_train=30)
    del cfg.dataset_config.__dict__["n_validate"]
    del cfg.dataset_config.__dict__["n_test"]
    dm = PSDDataModule(cfg)
    dm.setup("test")
    assert dm.val_dataset is not None
    assert dm.test_dataset is dm.val_dataset


def test_loader_prefetch_thread_exits_on_abandoned_iterator(data_dirs):
    import threading
    import time

    from waveformml_tpu.datasets.data_module import DataLoaderLite

    class SlowDataset:
        def __len__(self):
            return 64

        def __getitem__(self, i):
            from waveformml_tpu.datasets.hdf5_dataset import FileBlock
            return FileBlock(np.array([[0, 0, 0]], np.int32),
                             np.zeros((1, 4), np.float32),
                             np.zeros((1,), np.int64), {})

    loader = DataLoaderLite(SlowDataset(), batch_size=1, num_workers=1,
                            prefetch_depth=1)
    before = threading.active_count()
    it = iter(loader)
    next(it)
    it.close()  # abandon mid-epoch: generator finally sets stop
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before


def test_shuffle_map_partitions_every_event_exactly_once(tmp_path):
    """Property: _gen_shuffle_map must cover every (file, event) of every
    category exactly once across the queue, with per-output-file class
    quotas <= shuffled_size/n_categories — including the boundary where a
    file exactly fills a quota (which used to emit degenerate [lo,-1]
    chunks)."""
    from waveformml_tpu.datasets.synthetic import write_classification_dirs

    for events_per_file, shuffled_size in ((20, 40), (10, 20), (15, 20)):
        base = tmp_path / f"d{events_per_file}_{shuffled_size}"
        write_classification_dirs(str(base), ["TypeA", "TypeB"], n_files=4,
                                  events_per_file=events_per_file,
                                  n_samples=8, seed=events_per_file)
        cfg = _config(tmp_path, n_train=4 * events_per_file,
                      data_prep="shuffle", shuffled_size=shuffled_size)
        cfg.dataset_config.base_path = str(base)
        ds = PulseDataset2D(cfg, "train", 4 * events_per_file)
        per_cat_quota = shuffled_size // 2
        seen = {}  # (cat, file) -> set of event ids
        for entry in ds.shuffle_queue:
            for cat, chunks in entry.items():
                per_file_total = 0
                for fp, (lo, hi), _mtime in chunks:
                    assert hi >= lo >= 0, (fp, lo, hi)  # no degenerate chunks
                    evs = set(range(lo, hi + 1))
                    key = (cat, fp)
                    assert not (seen.setdefault(key, set()) & evs), \
                        f"events double-assigned for {key}"
                    seen[key] |= evs
                    per_file_total += hi - lo + 1
                assert per_file_total <= per_cat_quota
        # every allotted event of every file is covered exactly once
        for di in ds.info["data_info"]:
            lo, hi = di["event_range"]
            got = seen.get((di["dir_index"], di["file_path"]), set())
            assert got == set(range(lo, hi + 1)), di["file_path"]


def test_shuffle_label_file_alignment_with_empty_event(data_dirs, tmp_path,
                                                       monkeypatch):
    """Regression: label-file labels are indexed by ABSOLUTE event id. An
    event with zero pulse rows inside the selected range must not shift
    every later event's label by one (silent label corruption in the
    combined files)."""
    import h5py

    cfg = _config(tmp_path, n_train=40)
    ds = PulseDataset2D(cfg, "train", 40)
    ds.label_file_pattern = "*_labels.h5"  # event-label (label file) path
    ds.info["label_name"] = "PID"

    chunk = {
        # events 0 and 2 have rows; event 1 has NONE
        "coords": np.array([[1, 1, 0], [2, 2, 0], [3, 3, 2]], np.int32),
        "feats": np.ones((3, 2 * N_SAMPLES), np.float32),
        # raw labels for events 0,1,2: _get_label maps >=3 -> n_categories
        "event_labels": np.array([5, 1, 5]),
        "event_lo": 0,
    }
    monkeypatch.setattr(ds, "_read_range", lambda entry: dict(chunk))
    out = str(tmp_path / "Combined_align.h5")
    ds._write_shuffled({0: [["src.h5", [0, 2], 0.0]]}, out)
    with h5py.File(out) as h5:
        g = h5[ds.info["data_name"]]
        labels = g["labels"][()]
    want = ds._get_label(5, 0)  # both surviving events carry raw label 5
    assert list(labels) == [want, want], list(labels)
