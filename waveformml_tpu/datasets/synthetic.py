"""Synthetic HDF5 event data for hermetic tests and benchmarks.

Generates files matching the experiment's on-disk layouts (the contract in
waveformml_tpu.io.compound_types and the PulseDataset file masks), with
physically-shaped waveforms: exponential-tail scintillation pulses whose
amplitude ratio and timing encode a ground-truth (E, z) so models can actually
learn from the data (no reference-code counterpart; the reference ships no
test data generator beyond H5CompoundTypes.generate_random_data).
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Sequence, Tuple

import h5py
import numpy as np

from waveformml_tpu.detector import MAX_RANGE, NX, NY, Z_SCALE


def synth_waveform_pair(rng: np.random.Generator, n_samples: int, energy: float,
                        z: float, kind: int = 0) -> np.ndarray:
    """One PMT pair's waveform [2*n_samples]: left/right amplitudes follow an
    exponential attenuation in z; the tail fraction differs by particle kind
    (the PSD handle). Values on the raw ADC scale [0, MAX_RANGE]."""
    t = np.arange(n_samples, dtype=np.float32)
    t0 = 6.0 + rng.uniform(-1, 1)
    rise = np.clip((t - t0) / 1.5, 0, None)
    fast = np.exp(-np.clip(t - t0, 0, None) / 3.0)
    slow = np.exp(-np.clip(t - t0, 0, None) / 25.0)
    tail_frac = 0.12 + 0.25 * kind  # particle-dependent slow component
    shape = (1 - np.exp(-rise)) * ((1 - tail_frac) * fast + tail_frac * slow)
    zn = z / (Z_SCALE / 2)  # [-1, 1]
    amp_l = energy * np.exp(-zn * 0.8)
    amp_r = energy * np.exp(+zn * 0.8)
    scale = MAX_RANGE / 40.0
    wf_l = amp_l * scale * shape + rng.normal(0, 12, n_samples)
    wf_r = amp_r * scale * shape + rng.normal(0, 12, n_samples)
    return np.clip(np.concatenate([wf_l, wf_r]), 0, MAX_RANGE).astype(np.float32)


def make_events(rng: np.random.Generator, n_events: int, n_samples: int,
                kind: int = 0, max_mult: int = 4,
                start_event: int = 0) -> Dict[str, np.ndarray]:
    """Generate sparse events: coords [N,3], waveforms [N,2S], per-pulse E/z."""
    coords, wfs, es, zs = [], [], [], []
    for e in range(n_events):
        mult = int(rng.integers(1, max_mult + 1))
        sites = rng.choice(NX * NY, size=mult, replace=False)
        for s in sites:
            x, y = int(s % NX), int(s // NX)
            energy = float(rng.uniform(0.5, 10.0))
            z = float(rng.uniform(-Z_SCALE / 2, Z_SCALE / 2))
            coords.append([x, y, start_event + e])
            wfs.append(synth_waveform_pair(rng, n_samples, energy, z, kind))
            es.append(energy)
            zs.append(z)
    return {
        "coords": np.asarray(coords, dtype=np.int32),
        "waveforms": np.stack(wfs),
        "E": np.asarray(es, dtype=np.float32),
        "z": np.asarray(zs, dtype=np.float32),
    }


def write_waveform_pair_sim(path: str, n_events: int, n_samples: int,
                            kind: int = 0, seed: int = 0,
                            with_labels: Optional[str] = None) -> None:
    """Write a *WaveformPairSim.h5-style file (dataset "WaveformPairs",
    fields coord/waveform[+z/EZ]) consumed by PulseDataset2D{,WithZ,WithEZ}."""
    rng = np.random.default_rng(seed)
    ev = make_events(rng, n_events, n_samples, kind)
    n = ev["coords"].shape[0]
    fields = [("coord", np.int32, (3,)), ("waveform", np.float32, (2 * n_samples,))]
    dataset_name = "WaveformPairs"
    if with_labels == "z":
        fields.append(("z", np.float32, (1,)))
        dataset_name = "WaveformPairsWithZ"
    elif with_labels == "EZ":
        fields.append(("EZ", np.float32, (2,)))
        dataset_name = "WaveformPairsWithEZ"
    rec = np.zeros(n, dtype=np.dtype(fields))
    rec["coord"] = ev["coords"]
    rec["waveform"] = ev["waveforms"]
    if with_labels == "z":
        rec["z"][:, 0] = ev["z"] / Z_SCALE + 0.5
    elif with_labels == "EZ":
        rec["EZ"][:, 0] = ev["E"]
        rec["EZ"][:, 1] = ev["z"] / Z_SCALE + 0.5
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h5:
        h5.create_dataset(dataset_name, data=rec)
        h5[dataset_name].attrs.create("nevents", np.array([float(n_events)]))


def write_classification_dirs(base: str, type_names: Sequence[str],
                              n_files: int, events_per_file: int,
                              n_samples: int, seed: int = 0,
                              with_labels: Optional[str] = None) -> Dict[str, str]:
    """One directory per particle class, each with *WaveformPairSim.h5 files —
    the directory-as-label layout PulseDataset2D expects."""
    out = {}
    for k, name in enumerate(type_names):
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_files):
            p = os.path.join(d, f"{name}_{i:05d}_WaveformPairSim.h5")
            write_waveform_pair_sim(p, events_per_file, n_samples, kind=k,
                                    seed=seed + 1000 * k + i, with_labels=with_labels)
        out[name] = d
    return out


def write_waveform_3d_pair_sim(path: str, n_events: int, n_samples: int,
                               kind: int = 0, seed: int = 0,
                               threshold: float = 30.0) -> None:
    """Write a *Waveform3DPairSim.h5 file (table "Waveform3DPairs",
    coord[4]=(x, y, t, event) + waveform[2]) for PulseDataset3D: each active
    segment contributes one row per time sample where either PMT clears the
    noise threshold — sparse in space AND time."""
    from waveformml_tpu.io.compound_types import Waveform3DPair

    rng = np.random.default_rng(seed)
    ev = make_events(rng, n_events, n_samples, kind)
    coords2d = ev["coords"]                       # [P, 3] (x, y, event)
    wf = ev["waveforms"].reshape(-1, 2, n_samples)  # [P, 2, S]
    rows_c, rows_w = [], []
    for p in range(coords2d.shape[0]):
        keep = np.flatnonzero(wf[p].max(axis=0) > threshold)
        if keep.size == 0:
            keep = np.array([int(wf[p].max(axis=0).argmax())])
        x, y, e = coords2d[p]
        c = np.empty((keep.size, 4), np.int32)
        c[:, 0], c[:, 1], c[:, 2], c[:, 3] = x, y, keep, e
        rows_c.append(c)
        rows_w.append(wf[p, :, keep])             # [T_keep, 2]
    coords = np.concatenate(rows_c)
    waves = np.concatenate(rows_w).astype(np.float32)
    order = np.lexsort((coords[:, 2], coords[:, 1], coords[:, 0], coords[:, 3]))
    coords, waves = coords[order], waves[order]
    t = Waveform3DPair()
    rec = np.zeros(coords.shape[0], dtype=t.type)
    rec["coord"] = coords
    rec["waveform"] = waves
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h5:
        h5.create_dataset(t.NAME, data=rec)
        h5[t.NAME].attrs.create("nevents", np.array([float(n_events)]))


def write_classification_dirs_3d(base: str, type_names: Sequence[str],
                                 n_files: int, events_per_file: int,
                                 n_samples: int, seed: int = 0) -> Dict[str, str]:
    """Directory-per-class layout of *Waveform3DPairSim.h5 files for
    net_type 3DConvolution runs."""
    out = {}
    for k, name in enumerate(type_names):
        d = os.path.join(base, name)
        os.makedirs(d, exist_ok=True)
        for i in range(n_files):
            p = os.path.join(d, f"{name}_{i:05d}_Waveform3DPairSim.h5")
            write_waveform_3d_pair_sim(p, events_per_file, n_samples, kind=k,
                                       seed=seed + 1000 * k + i)
        out[name] = d
    return out


def write_wfpair_cal(path: str, n_events: int, seed: int = 0,
                     file_tag: str = "WFPairSim",
                     compression: int = 0) -> None:
    """Write a *WFPairSim.h5 / *WFCalFilteredSE.h5-style WaveformPairCal table.

    compression > 0 writes the table gzip-chunked like the experiment's
    analysis chain does (ref: HDF5IO.py:88-91 gzip, chunks=(1024,));
    0 (default) writes uncompressed for test speed."""
    from waveformml_tpu.io.compound_types import WaveformPairCal

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    rng = np.random.default_rng(seed)
    t = WaveformPairCal()
    # per-pulse particle kind drives the tail fraction (the PSD handle), so
    # PID labels are physically learnable from the waveform shape
    coords, wfs, es, zs, kinds = [], [], [], [], []
    pid_of_kind = np.array([1, 4, 6])
    for e in range(n_events):
        mult = int(rng.integers(1, 5))
        sites = rng.choice(NX * NY, size=mult, replace=False)
        for s in sites:
            x, y = int(s % NX), int(s // NX)
            kind = int(rng.integers(0, 3))
            energy = float(rng.uniform(0.5, 10.0))
            z = float(rng.uniform(-Z_SCALE / 2, Z_SCALE / 2))
            coords.append([x, y, e])
            wfs.append(synth_waveform_pair(rng, 65, energy, z, kind))
            es.append(energy)
            zs.append(z)
            kinds.append(kind)
    ev = {"coords": np.asarray(coords, np.int32), "waveforms": np.stack(wfs),
          "E": np.asarray(es, np.float32), "z": np.asarray(zs, np.float32)}
    n = ev["coords"].shape[0]
    rec = np.zeros(n, dtype=t.type)
    rec["coord"] = ev["coords"]
    rec["evt"] = ev["coords"][:, 2]
    rec["waveform"] = np.clip(ev["waveforms"], 0, MAX_RANGE).astype(np.int16)
    rec["E"] = ev["E"]
    rec["z"] = ev["z"]
    rec["EZ"][:, 0] = ev["E"]
    rec["EZ"][:, 1] = ev["z"]
    rec["PE"] = rng.uniform(10, 1000, (n, 2)).astype(np.float32)
    rec["PSD"] = (0.12 + 0.25 * np.asarray(kinds) / 2
                  + rng.normal(0, 0.01, n)).astype(np.float32)
    rec["PID"] = pid_of_kind[np.asarray(kinds)].astype(np.int32)
    with h5py.File(path, "w") as h5:
        if compression:
            h5.create_dataset("WaveformPairCal", data=rec,
                              chunks=(min(1024, n),),
                              compression="gzip", compression_opts=compression)
        else:
            h5.create_dataset("WaveformPairCal", data=rec)
        h5["WaveformPairCal"].attrs.create("nevents", np.array([float(n_events)]))


def _phys_vector(E, z, psd, rng, n):
    """AD1 phys 7-vector (E, dt, PE0, PE1, z, PSD, t0) — AD1Evaluator schema."""
    phys = np.zeros((n, 7), np.float32)
    phys[:, 0] = E
    phys[:, 1] = rng.normal(0, 1.0, n)          # dt
    phys[:, 2] = E * 120 * np.exp(-z / 600)     # PE0
    phys[:, 3] = E * 120 * np.exp(+z / 600)     # PE1
    phys[:, 4] = z
    phys[:, 5] = psd
    phys[:, 6] = rng.uniform(0, 50, n)          # t0
    return phys


def write_wfnorm(path: str, n_events: int, seed: int = 0) -> None:
    """Write a *WFNorm.h5 WaveformPairNorm table (normalized pulse pairs +
    phys labels) for PulseDatasetWFPairNorm."""
    from waveformml_tpu.io.compound_types import WaveformPairNorm

    rng = np.random.default_rng(seed)
    t = WaveformPairNorm()
    ev = make_events(rng, n_events, 65, kind=0)
    n = ev["coords"].shape[0]
    rec = np.zeros(n, dtype=t.type)
    rec["t"] = np.arange(n, dtype=np.float64)
    rec["coord"] = ev["coords"]
    rec["pulse"] = (ev["waveforms"] / MAX_RANGE).astype(np.float32)
    psd = rng.uniform(0.1, 0.4, n).astype(np.float32)
    rec["phys"] = _phys_vector(ev["E"], ev["z"], psd, rng, n)
    rec["EZ"][:, 0] = ev["E"]
    rec["EZ"][:, 1] = ev["z"]
    rec["PID"] = rng.choice([1, 4, 6], n).astype(np.int32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h5:
        h5.create_dataset(t.NAME, data=rec)
        h5[t.NAME].attrs.create("nevents", np.array([float(n_events)]))


def write_pulse_norm(path: str, n_pulses: int, seed: int = 0,
                     n_samples: int = 65) -> None:
    """Write a *PulseNorm.h5 WaveformNorm table (single normalized waveforms
    with scalar det ids) for PulseDatasetWaveformNorm. The PSD phys entry is
    the true tail fraction, so regressors can learn it from the shape."""
    from waveformml_tpu.io.compound_types import WaveformNorm

    rng = np.random.default_rng(seed)
    t = WaveformNorm()
    rec = np.zeros(n_pulses, dtype=t.type)
    samples = np.arange(n_samples, dtype=np.float64)
    for i in range(n_pulses):
        tail = float(rng.uniform(0.05, 0.45))
        t0 = 6.0 + rng.uniform(-1, 1)
        dt = np.clip(samples - t0, 0, None)
        shape = (1 - np.exp(-np.clip((samples - t0) / 1.5, 0, None))) \
            * ((1 - tail) * np.exp(-dt / 3.0) + tail * np.exp(-dt / 25.0))
        amp = rng.uniform(0.05, 0.9)
        wf = np.zeros(130, np.float32)
        wf[:n_samples] = (amp * shape).astype(np.float32)
        rec["pulse"][i] = wf
        rec["phys"][i] = _phys_vector(np.float32(amp * 10),
                                      np.float32(rng.uniform(-500, 500)),
                                      np.float32(tail), rng, 1)[0]
    rec["t"] = np.arange(n_pulses, dtype=np.float64)
    rec["evt"] = np.arange(n_pulses, dtype=np.int64)
    rec["det"] = rng.integers(0, 308, n_pulses).astype(np.int32)
    rec["EZ"][:, 0] = rec["phys"][:, 0]
    rec["EZ"][:, 1] = rec["phys"][:, 4]
    rec["PID"] = rng.choice([1, 4, 6], n_pulses).astype(np.int32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h5:
        h5.create_dataset(t.NAME, data=rec)
        h5[t.NAME].attrs.create("nevents", np.array([float(n_pulses)]))


def write_wf_features(path: str, n_events: int, n_features: int = 8,
                      seed: int = 0) -> None:
    """Write a *WFFeatures.h5 NormFeatures table (extracted per-segment
    feature vectors) for PulseDatasetNormFeatures."""
    rng = np.random.default_rng(seed)
    ev = make_events(rng, n_events, 8, kind=0)
    n = ev["coords"].shape[0]
    dt = np.dtype([("coord", np.int32, (3,)), ("features", np.float32, (n_features,)),
                   ("EZ", np.float32, (2,)), ("PID", np.int32)])
    rec = np.zeros(n, dtype=dt)
    rec["coord"] = ev["coords"]
    rec["features"] = rng.normal(size=(n, n_features)).astype(np.float32)
    rec["EZ"][:, 0] = ev["E"]
    rec["EZ"][:, 1] = ev["z"]
    rec["PID"] = rng.choice([1, 4, 6], n).astype(np.int32)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with h5py.File(path, "w") as h5:
        h5.create_dataset("NormFeatures", data=rec)
        h5["NormFeatures"].attrs.create("nevents", np.array([float(n_events)]))
