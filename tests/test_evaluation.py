import os

import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY


class FakeLogger:
    def __init__(self):
        self.figures = {}
        self.scalars = {}
        self.log_dir = "/tmp"

    def log_figure(self, tag, fig, step=0, close=True):
        self.figures[tag] = True
        import matplotlib.pyplot as plt

        plt.close(fig)

    def log_scalar(self, tag, value, step=0):
        self.scalars[tag] = value

    def log_scalars(self, values, step=0):
        self.scalars.update(values)

    def log_histogram(self, tag, values, step=0):
        self.figures[tag] = True

    def flush(self):
        pass


def test_stats_aggregator_roundtrip():
    from waveformml_tpu.evaluation.stats import StatsAggregator

    agg = StatsAggregator(FakeLogger())
    agg.register_aggregator("acc_vs_E", (10,), (0.0,), (10.0,), 1, ("E",),
                            ("MeV",), "accuracy", "")
    results = np.array([1.0, 0.0, 1.0, 1.0])
    params = np.array([0.5, 0.5, 5.5, 11.0])
    agg.accumulate("acc_vs_E", results, (params,))
    total, count = agg.results["acc_vs_E"]
    assert count[1] == 2 and total[1] == 1.0     # bin for 0.5
    assert count[-1] == 1                        # overflow
    agg.log_metric("acc_vs_E", "acc", "accuracy vs E")
    assert "evaluation/acc" in agg.logger.figures


def test_metric_aggregator_welford():
    from waveformml_tpu.evaluation.metric_agg import MetricAggregator

    m = MetricAggregator("E", 0, 10, 10, ["a", "b"], metric_name="MAE")
    rng = np.random.default_rng(0)
    res = rng.normal(2.0, 0.5, 200)
    par = rng.uniform(0, 10, 200)
    m.add(res[:100], par[:100], "a")
    m.add(res[100:], par[100:], "a")
    mean, std = m.mean_std(0)
    total_mean = (m.mean[0] * m.count[0]).sum() / m.count[0].sum()
    assert total_mean == pytest.approx(res.mean(), abs=1e-6)
    # Welford m2 -> per-bin sample std must match numpy on each bin's values
    # (aggregator index b+1: slot 0 is underflow, reference convention)
    edges = np.linspace(m.low, m.high, m.n_bins + 1)
    for b in range(m.n_bins):
        sel = (par >= edges[b]) & (par < edges[b + 1])
        if sel.sum() > 1:
            assert std[b + 1] == pytest.approx(np.std(res[sel], ddof=1),
                                               rel=1e-5)
            assert mean[b + 1] == pytest.approx(res[sel].mean(), rel=1e-5)


def test_roc_curve_perfect_classifier():
    from waveformml_tpu.evaluation.roc import ROCCurve

    roc = ROCCurve(2)
    logits = np.array([[5.0, -5.0]] * 50 + [[-5.0, 5.0]] * 50)
    labels = np.array([0] * 50 + [1] * 50)
    roc.update(logits, labels)
    auc = roc.auc()
    assert auc[0] > 0.95 and auc[1] > 0.95


def test_pid_map():
    from waveformml_tpu.evaluation.pid_eval import map_pid, retrieve_class_names_PIDS

    np.testing.assert_array_equal(map_pid(np.array([1, 4, 6, 256, 258, 512, 999])),
                                  [0, 1, 2, 3, 2, 4, -1])
    names, pids = retrieve_class_names_PIDS()
    assert names[2] == "Neutron Capture"
    assert set(pids[2]) == {6, 258}


def test_psd_evaluator_accumulates_and_dumps(rng):
    from waveformml_tpu.evaluation.psd_eval import PSDEvaluator

    logger = FakeLogger()
    ev = PSDEvaluator(["A", "B"], logger)
    n_events = 20
    rows = []
    for e in range(n_events):
        for s in rng.choice(NX * NY, 2, replace=False):
            rows.append([s % NX, s // NX, e])
    coords = np.asarray(rows, dtype=np.int32)
    pulses = rng.random((len(coords), 32)).astype(np.float64) * 0.01
    labels = rng.integers(0, 2, n_events)
    preds = labels.copy()
    preds[:5] = 1 - preds[:5]  # some errors
    logits = np.where((np.arange(n_events) % 2 == 0)[:, None],
                      np.array([[2.0, -2.0]]), np.array([[-2.0, 2.0]]))
    ev.add(coords, pulses, labels, preds, logits=logits)
    assert ev.confusion.sum() == n_events
    ev.dump()
    assert "evaluation/confusion" in logger.figures
    assert "evaluation/average_pulse" in logger.figures
    # reference figure variants (ref: PSDEvaluator.py:136-233)
    assert "evaluation/average_pulse_normalized" in logger.figures
    assert "evaluation/average_pulse_labelled" in logger.figures
    assert "evaluation/pulse" in logger.figures
    assert "evaluation/energy" in logger.figures
    assert "evaluation/output_A" in logger.figures
    # 2-D surfaces + precision curves (ref: PSDEvaluator.py:402-476)
    assert "evaluation/energy_psd_accuracy" in logger.figures
    assert "evaluation/position_accuracy" in logger.figures
    assert "evaluation/EPSD" in logger.figures
    assert "evaluation/EPSD_classes" in logger.figures
    assert "evaluation/energy_psd_precision" in logger.figures
    assert "evaluation/multiplicity" in logger.figures
    assert "evaluation/multiplicity_precision" in logger.figures
    assert "evaluation/multiplicity_classes" in logger.figures
    assert "evaluation/energy_precision" in logger.figures


def test_z_evaluator_mae(rng):
    from waveformml_tpu.evaluation.z_eval import ZEvaluatorWF

    logger = FakeLogger()
    ev = ZEvaluatorWF(logger)
    B = 10
    coords = np.stack([rng.integers(0, NX, 15), rng.integers(0, NY, 15),
                       np.sort(rng.integers(0, B, 15))], axis=1).astype(np.int32)
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    from waveformml_tpu.ops.sparse import consecutive_event_index

    b = consecutive_event_index(coords[:, 2])
    tvals = rng.uniform(0.2, 0.8, 15)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = tvals + 0.05
    ev.add(pred, target, coords)
    m = ev.metrics()
    # MAE should be ≈ 0.05 * z_scale = 60 mm
    vals = list(m.values())
    assert vals and all(40 < v < 80 for v in vals)
    ev.dump()
    assert any("z_mae" in k.lower() or "z MAE" in k for k in logger.figures)


def test_energy_evaluator_mape(rng):
    from waveformml_tpu.evaluation.energy_eval import EnergyEvaluatorWF

    logger = FakeLogger()
    ev = EnergyEvaluatorWF(logger)
    coords = np.array([[1, 1, 0], [2, 2, 1]], dtype=np.int32)
    target = np.zeros((2, 1, NX, NY))
    pred = np.zeros((2, 1, NX, NY))
    target[0, 0, 1, 1] = 0.5
    pred[0, 0, 1, 1] = 0.55   # 10% error
    target[1, 0, 2, 2] = 0.4
    pred[1, 0, 2, 2] = 0.44
    ev.add(pred, target, coords)
    ev.dump()
    total = (ev.E_mape.mean * ev.E_mape.count).sum() / ev.E_mape.count.sum()
    assert total == pytest.approx(0.1, abs=0.01)
    # summary scalar + combined per-mult figure (ref: EnergyEvaluator.py:94-121)
    assert any(k.endswith("_E_MAPE") for k in logger.scalars), logger.scalars
    assert "evaluation/E_error_summary_mult" in logger.figures


def test_ez_evaluator_composes(rng):
    from waveformml_tpu.evaluation.ez_eval import EZEvaluatorWF

    logger = FakeLogger()
    ev = EZEvaluatorWF(logger)
    coords = np.array([[3, 3, 0]], dtype=np.int32)
    pred = np.zeros((1, 2, NX, NY))
    targ = np.zeros((1, 2, NX, NY))
    targ[0, 0, 3, 3] = 0.6   # z
    targ[0, 1, 3, 3] = 0.3   # E
    pred[0, 0, 3, 3] = 0.62
    pred[0, 1, 3, 3] = 0.33
    ev.add(pred, targ, coords)
    ev.dump()
    assert ev.z_eval.z_mae.count.sum() == 1
    assert ev.e_eval.E_mape.count.sum() == 1


def test_pid_evaluator(rng):
    from waveformml_tpu.evaluation.pid_eval import PIDEvaluator

    logger = FakeLogger()
    ev = PIDEvaluator(logger, SE_only=False)
    coords = np.stack([rng.integers(0, NX, 30), rng.integers(0, NY, 30),
                       np.sort(rng.integers(0, 10, 30))], axis=1).astype(np.int32)
    labels = rng.integers(0, 5, 30)
    preds = labels.copy()
    preds[:10] = (preds[:10] + 1) % 5
    ev.add(coords, labels, preds)
    assert ev.confusion.sum() == 30
    ev.dump()
    assert "evaluation/pid_confusion" in logger.figures


def test_tensor_evaluator(rng):
    from waveformml_tpu.evaluation.tensor_eval import TensorEvaluator

    logger = FakeLogger()
    ev = TensorEvaluator(logger, metric_name="mean absolute error")
    dets = rng.integers(0, 308, 40)
    f = rng.random((40, 16))
    target = rng.random(40)
    results = rng.random(40) * 0.1
    ev.add(dets, f, target, results)
    ev.dump()
    assert any("metric_by_detector" in k for k in logger.figures)


def test_waveform_evaluator(rng):
    from waveformml_tpu.evaluation.waveform_eval import WaveformEvaluator

    logger = FakeLogger()
    ev = WaveformEvaluator(logger)
    wfs = np.zeros((20, 64))
    peaks = rng.integers(10, 40, 20)
    for i, p in enumerate(peaks):
        wfs[i, p] = 1.0
        wfs[i, p + 1] = 0.6
    z = rng.uniform(-500, 500, 20)
    ev.add(wfs, z)
    ev.dump()
    assert "evaluation/aligned_waveforms_by_z" in logger.figures


def test_trainer_test_pass_runs_evaluator(tmp_path, rng):
    """Full wiring: trainer.test builds the task evaluator, feeds it every
    batch, and dump() pushes figures (ref: LitCallbacks.py:52-73)."""
    from waveformml_tpu.config import Config
    from waveformml_tpu.datasets.data_module import PSDDataModule
    from waveformml_tpu.datasets.synthetic import write_classification_dirs
    from waveformml_tpu.engineering.tasks import LitPSD
    from waveformml_tpu.engineering.trainer import Trainer

    write_classification_dirs(str(tmp_path / "data"), ["A", "B"], n_files=3,
                              events_per_file=20, n_samples=8, seed=5)
    cfg = Config({
        "run_config": {"exp_name": "t", "run_class": "LitPSD", "imports": []},
        "system_config": {"model_name": "m", "n_samples": 8, "n_type": 2,
                          "type_names": ["A", "B"],
                          "model_base_path": str(tmp_path / "model"),
                          "gpu_enabled": False, "half_precision": 0},
        "net_config": {"criterion_class": "CrossEntropyLoss", "criterion_params": [],
                       "imports": [], "net_class": "DenseConvNet",
                       "net_type": "2DConvolution",
                       "hparams": {"n_conv": 1, "n_lin": 1, "out_planes": 2,
                                   "conv_params": {"size_factor": 2, "pad_factor": 1.0}}},
        "optimize_config": {"total_epoch": 1, "lr": 0.01, "validation_freq": 1,
                            "imports": [], "optimizer_class": "optim.SGD",
                            "optimizer_params": {}},
        "dataset_config": {"mode": "path", "imports": [],
                           "base_path": str(tmp_path / "data"),
                           "paths": ["A", "B"], "dataset_class": "PulseDataset2D",
                           "dataset_params": {}, "dataloader_params": {"batch_size": 1},
                           "n_train": 20, "n_validate": 10, "n_test": 10},
    })
    logger = FakeLogger()
    task = LitPSD(cfg)
    trainer = Trainer(cfg, task, logger=logger, max_epochs=1, seed=0)
    dm = PSDDataModule(cfg)
    trainer.fit(dm)
    metrics = trainer.test(dm)
    assert task.evaluator is not None
    assert task.evaluator.confusion.sum() > 0
    assert any("confusion" in k for k in logger.figures)


def test_z_deviation_accumulator_matches_reference_semantics(rng):
    """Vectorized ZDeviationAccumulator == a scalar oracle implementing the
    reference kernel semantics (SparseUtils.py:1156-1175, 1260-1419, 1422-1456):
    mult column mult-1 clipped to an overflow column, under/overflow z/E bins,
    single = seg_status > 0, signed error hists at the sample segments."""
    from waveformml_tpu.evaluation.z_eval import (
        NMULT_REF, SAMPLE_SEGS, ZDeviationAccumulator)

    N = 400
    x = rng.integers(0, NX, N)
    y = rng.integers(0, NY, N)
    # make sure the sample segments are hit
    x[:30], y[:30] = SAMPLE_SEGS[0]
    mult = rng.integers(1, 9, N)
    pred = rng.uniform(-0.3, 1.3, N)
    targ = rng.uniform(-0.3, 1.3, N)
    E = rng.uniform(-1.0, 12.0, N)
    seg_status = np.zeros((NX, NY))
    seg_status[rng.random((NX, NY)) < 0.3] = 0.5
    is_single = seg_status[x, y] > 0

    acc = ZDeviationAccumulator()
    acc.add(pred, targ, x, y, mult, is_single, E=E)

    # scalar oracle
    nb, nm = acc.n_bins, NMULT_REF
    seg = np.zeros((NX, NY, nm + 1))
    segn = np.zeros((NX, NY, nm + 1))
    zm = {w: [np.zeros((nb + 2, nm + 1)), np.zeros((nb + 2, nm + 1))]
          for w in ("single", "dual")}
    em = {w: [np.zeros((nb + 2, nm + 1)), np.zeros((nb + 2, nm + 1))]
          for w in ("single", "dual")}
    serr = np.zeros((len(SAMPLE_SEGS), nm + 1, acc.n_err_bins + 2))

    def bin_of(v, low, high, n):
        if v < low:
            return 0
        if v >= high:
            return n + 1
        bw = (high - low) / n
        for k in range(1, n + 1):
            if k * bw + low > v:
                return k
        return n

    for i in range(N):
        m = mult[i] - 1 if 1 <= mult[i] <= nm else nm
        err = abs(pred[i] - targ[i])
        zb = bin_of((targ[i] - 0.5) * 1200.0, -600.0, 600.0, nb)
        eb = bin_of(E[i], 0.0, 10.0, nb)
        seg[x[i], y[i], m] += err
        segn[x[i], y[i], m] += 1
        w = "single" if seg_status[x[i], y[i]] > 0 else "dual"
        zm[w][0][zb, m] += err
        zm[w][1][zb, m] += 1
        em[w][0][eb, m] += err
        em[w][1][eb, m] += 1
        for si, (sx, sy) in enumerate(SAMPLE_SEGS):
            if x[i] == sx and y[i] == sy:
                ebn = bin_of((pred[i] - targ[i]) * 1200.0, -1000.0, 1000.0,
                             acc.n_err_bins)
                serr[si, m, ebn] += 1

    np.testing.assert_allclose(acc.seg_mult[0], seg, atol=1e-10)
    np.testing.assert_array_equal(acc.seg_mult[1], segn)
    for w in ("single", "dual"):
        np.testing.assert_allclose(acc.z_mult[w][0], zm[w][0], atol=1e-10)
        np.testing.assert_array_equal(acc.z_mult[w][1], zm[w][1])
        np.testing.assert_allclose(acc.E_mult[w][0], em[w][0], atol=1e-10)
        np.testing.assert_array_equal(acc.E_mult[w][1], em[w][1])
    np.testing.assert_array_equal(acc.seg_sample_error, serr)


def test_z_evaluator_full_depth_dump(rng):
    """The full reference figure set: per-mult segment matrices, sample-segment
    error hists, (z|E)×mult total+MAE maps, summary scalars + line figures."""
    from waveformml_tpu.evaluation.z_eval import SAMPLE_SEGS, ZEvaluatorWF
    from waveformml_tpu.ops.sparse import consecutive_event_index

    logger = FakeLogger()
    ev = ZEvaluatorWF(logger)
    B, N = 20, 60
    coords = np.stack([rng.integers(0, NX, N), rng.integers(0, NY, N),
                       np.sort(rng.integers(0, B, N))], axis=1).astype(np.int32)
    coords[:10, 0], coords[:10, 1] = SAMPLE_SEGS[0]     # hit a sample segment
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    b = consecutive_event_index(coords[:, 2])
    tvals = rng.uniform(0.2, 0.8, N)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = tvals + rng.normal(0, 0.1, N)
    E = rng.uniform(0.5, 8.0, N)
    ev.add(pred, target, coords, E=E)
    ev.dump()
    assert "evaluation/single_mae" in logger.scalars
    assert "evaluation/dual_mae" in logger.scalars
    figs = logger.figures
    assert any(k.startswith("evaluation/z_seg_6_5_mult_") for k in figs), figs
    assert any(k.startswith("evaluation/z_seg_mult_") for k in figs)
    assert "evaluation/z_mult_single" in figs or "evaluation/z_mult_dual" in figs
    assert "evaluation/z_mult_mae_dual" in figs or "evaluation/z_mult_mae_single" in figs
    assert "evaluation/E_mult_mae_dual" in figs or "evaluation/E_mult_mae_single" in figs
    assert "evaluation/error_summary_mult" in figs


def test_plot_contour_n_contour_bar_animation(tmp_path):
    from waveformml_tpu.utils.plot import (gen_animation, plot_bar,
                                           plot_contour, plot_n_contour)

    X = np.linspace(0, 1, 8)
    Y = np.linspace(0, 2, 6)
    Z = np.outer(np.sin(X * 3), np.cos(Y))          # [x, y] layout
    fig = plot_contour(X, Y, Z, "x", "y", "t")
    assert fig is not None
    fig2 = plot_contour(X, Y, Z, "x", "y", "t", filled=False)
    assert fig2 is not None
    figs = plot_n_contour(X, Y, [Z, Z * 2, Z * 3, -Z], titles=list("abcd"),
                          xlabel="x", ylabel="y", suptitle="panels")
    assert len(figs.get_axes()) >= 4
    fig3 = plot_bar([1, 2, 3], [4.0, 5.0, 6.0], "x", "y")
    assert fig3 is not None
    import matplotlib.pyplot as plt

    plt.close("all")
    out = str(tmp_path / "anim.gif")
    frames = [np.outer(np.sin(X * 3 + k), np.cos(Y)) for k in range(4)]
    gen_animation(frames, out)
    assert os.path.getsize(out) > 0


def test_waveform_evaluator_z_binned_sample_metrics(rng):
    """analyze_wf_z accumulates |z - z_pred| vs the first-sample amplitudes of
    both PMTs, per z bin + all-z, and dump emits z{i}_/allz_ figures
    (ref WaveformEvaluator.py:32-135)."""
    from waveformml_tpu.evaluation.waveform_eval import (N_FIRST, N_Z_BINS,
                                                         WaveformEvaluator)

    logger = FakeLogger()
    ev = WaveformEvaluator(logger, wf_analysis=True)
    assert ev.analyze_waveforms
    N, S = 50, 16
    wf = np.zeros((N, 2 * S), np.float32)
    # sharp pulse with exponential tail on both sides
    t = np.arange(S)
    for i in range(N):
        start = rng.integers(2, 6)
        shape = np.where(t >= start, np.exp(-(t - start) / 3.0), 0.0)
        wf[i, :S] = shape * rng.uniform(0.002, 0.01)
        wf[i, S:] = shape * rng.uniform(0.002, 0.01)
    c = np.stack([rng.integers(0, NX, N), rng.integers(0, NY, N),
                  np.arange(N)], axis=1).astype(np.int32)
    z = rng.uniform(-590, 590, N)
    z_pred = z + rng.normal(0, 30, N)
    ev.analyze_wf_z(wf, c, z, z_pred)
    # all-z aggregator saw every row twice (both PMT sides)
    allz = ev.z_binned_metric_pairs[-1].aggregators[0]
    assert allz.count[0].sum() == 2 * N
    aligned = ev._align_first_samples(wf)
    assert aligned.shape == (N, 2, N_FIRST)
    # aligned: first sample is the arrival sample (peak region, nonzero)
    assert (aligned[:, :, 0] > 0).mean() > 0.9
    ev.dump_wf_z()
    assert any(k.startswith("allz_") for k in logger.figures)
    assert any(k.startswith("z1_") or k.startswith("z5_") for k in logger.figures)
    # fft of aligned pulses has the right shape
    assert ev.fft_pulses(wf).shape == (N, 2, N_FIRST // 2 + 1)


def test_z_evaluator_reference_figure_accounting(tmp_path, monkeypatch, rng):
    """Reference ZEvaluator figure parity (VERDICT #6): a calibrated synthetic
    run must emit every figure/scalar family the reference dump produces
    (ref: ZEvaluator.py:140-415). Intentional tag differences are documented
    in docs/evaluator_figures.md."""
    import re

    from waveformml_tpu.evaluation.z_eval import ZEvaluatorWF
    from waveformml_tpu.io.sql import write_synthetic_caldb

    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "figcal", seed=7)
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    logger = FakeLogger()
    ev = ZEvaluatorWF(logger, calgroup="figcal")
    assert ev._has_cal_metrics

    from waveformml_tpu.evaluation.z_eval import SAMPLE_SEGS
    from waveformml_tpu.ops.sparse import consecutive_event_index

    # events covering mult 1..3, including the three reference sample segments
    rows = []
    B = 60
    for e in range(B):
        mult = 1 + e % 3
        segs = [tuple(SAMPLE_SEGS[e % 3])]
        while len(segs) < mult:
            cand = (int(rng.integers(0, NX)), int(rng.integers(0, NY)))
            if cand not in segs:
                segs.append(cand)
        for (x, y) in segs:
            rows.append([x, y, e])
    coords = np.asarray(rows, dtype=np.int32)
    n = coords.shape[0]
    b = consecutive_event_index(coords[:, 2])
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    tvals = rng.uniform(0.2, 0.8, n)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = np.clip(
        tvals + rng.normal(0, 0.05, n), 0, 1)
    feats = rng.random((n, 130)).astype(np.float32) * 0.05
    E = rng.uniform(0.5, 8.0, n)
    ev.add(pred, target, coords, f=feats, E=E)
    ev.dump()

    figs = set(logger.figures)
    scalars = set(logger.scalars)
    for s in ("single_mae", "dual_mae", "single_mae_cal", "dual_mae_cal",
              # per-mult and per-E scalar SERIES (ref :165-204)
              "single_mae_mult", "dual_mae_mult",
              "single_mae_mult_cal", "dual_mae_mult_cal",
              "single_mae_E", "dual_mae_E",
              "single_mae_E_cal", "dual_mae_E_cal",
              # separated classical baselines (dt-only / light-ratio-only z)
              "single_mae_cal_dt", "dual_mae_cal_dt",
              "single_mae_cal_light", "dual_mae_cal_light"):
        assert f"evaluation/{s}" in scalars, sorted(scalars)
    # one required-regex per reference figure family (cal branch active)
    required = [
        r"z_error_summary_mult$",
        r"z_error_summary_mult_baselines$",
        r"z_error_summary_E_single$",
        r"z_error_summary_E_dual$",
        r"z_seg_\d+_\d+_mult_\d+_error$",
        r"z_seg_mult_\d+_mae$",
        r"z_mult_single$", r"z_mult_dual$",
        r"z_mult_mae_single$", r"z_mult_mae_dual$",
        r"E_mult_single$", r"E_mult_dual$",
        r"E_mult_mae_single$", r"E_mult_mae_dual$",
        r"cal_z_seg_\d+_\d+_mult_\d+_error$",
        r"cal_z_seg_mult_\d+_mae$",
        r"cal_z_mult_single$", r"cal_z_mult_dual$",
        r"cal_z_mult_mae_single$", r"cal_z_mult_mae_dual$",
        r"cal_E_mult_single$", r"cal_E_mult_dual$",
        r"cal_E_mult_mae_single$", r"cal_E_mult_mae_dual$",
    ]
    missing = [pat for pat in required
               if not any(re.search(pat, t) for t in figs)]
    assert not missing, (missing, sorted(figs))


def test_z_evaluator_target_is_cal_baseline(tmp_path, monkeypatch, rng):
    """Real-data mode (ZEvaluatorRealWFNorm): with target_is_cal the cal
    baseline is the neighbor-filled target grid — exact at dual-ended
    segments, so cal error there is 0 (ref: ZEvaluator.py:513-517 +
    SparseUtils.py:1079-1121)."""
    from waveformml_tpu.engineering.se_mask import seg_status_maps
    from waveformml_tpu.evaluation.z_eval import ZEvaluatorRealWFNorm
    from waveformml_tpu.io.sql import write_synthetic_caldb
    from waveformml_tpu.ops.sparse import consecutive_event_index

    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "rcal", seed=3)
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    logger = FakeLogger()
    ev = ZEvaluatorRealWFNorm(logger, calgroup="rcal")
    seg_status = np.asarray(seg_status_maps()[0])
    de_sites = np.argwhere(seg_status == 0.0)

    B = 20
    rows = []
    for e in range(B):
        for (x, y) in de_sites[rng.choice(len(de_sites), 2, replace=False)]:
            rows.append([x, y, e])
    coords = np.asarray(rows, dtype=np.int32)
    n = coords.shape[0]
    b = consecutive_event_index(coords[:, 2])
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    tvals = rng.uniform(0.2, 0.8, n)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = np.clip(
        tvals + rng.normal(0, 0.1, n), 0, 1)
    feats = rng.random((n, 130)).astype(np.float32) * 0.05
    ev.add(pred, target, coords, feats, E=rng.uniform(1, 5, n))
    # all rows are dual-ended -> cal baseline == target -> zero cal error
    dev_sum, cnt = ev.dev_cal.z_mult["dual"]
    assert cnt.sum() == n
    assert float(np.abs(dev_sum).sum()) < 1e-9
    # NN deviation is nonzero on the same rows
    nn_sum, nn_cnt = ev.dev.z_mult["dual"]
    assert nn_cnt.sum() == n and float(np.abs(nn_sum).sum()) > 1e-3


def test_z_evaluator_phys_baseline_fills_single_ended(rng):
    """ZEvaluatorPhys cal baseline runs z_basic_prediction: 0.5 placeholders
    at single-ended rows are replaced by the diagonal-neighbor mean of known
    rows in the same event (ref: ZEvaluator.py:433-435 + SparseUtils.py:1124)."""
    from waveformml_tpu.evaluation.z_eval import ZEvaluatorPhys

    ev = ZEvaluatorPhys(FakeLogger())
    # one event: two known z rows diagonal to an unknown (0.5) row
    c = np.array([[4, 4, 0], [6, 6, 0], [5, 5, 0]], np.int64)
    f = np.zeros((3, 9), np.float32)
    f[:, ev.z_index] = [0.2, 0.4, 0.5]  # last row unknown (0.5 placeholder)
    out = ev.z_from_cal(c, f, None)
    assert out[0, 4, 4] == pytest.approx(0.2)
    assert out[0, 6, 6] == pytest.approx(0.4)
    assert out[0, 5, 5] == pytest.approx(0.3)  # neighbor mean, NOT the 0.5


def test_waveform_evaluator_pid_classes_and_any_allz(rng):
    """With PID classes active, the per-z-bin aggregators use the PID class
    names but the trailing all-z aggregate is single-category \"any\"
    (ref WaveformEvaluator.py:45-67) — analyze_wf_z must not crash feeding
    it, and wf_analysis=False must DISABLE analysis (value check, not the
    reference's key-presence quirk)."""
    from waveformml_tpu.evaluation.waveform_eval import WaveformEvaluator

    assert not WaveformEvaluator(
        FakeLogger(), wf_analysis=False).analyze_waveforms

    logger = FakeLogger()
    ev = WaveformEvaluator(logger, wf_analysis=True,
                           additional_field_names=["PID"])
    assert ev.has_PID
    N, S = 24, 16
    wf = np.zeros((N, 2 * S), np.float32)
    t = np.arange(S)
    for i in range(N):
        shape = np.where(t >= 3, np.exp(-(t - 3) / 3.0), 0.0)
        wf[i, :S] = wf[i, S:] = shape * 0.005
    c = np.stack([rng.integers(0, NX, N), rng.integers(0, NY, N),
                  np.arange(N)], axis=1).astype(np.int32)
    z = rng.uniform(-590, 590, N)
    # already-mapped class indices including 3 (Ingress) so the
    # reference-verbatim '3 in raw' heuristic keeps them as-is
    pid = rng.integers(0, 5, N).astype(np.int64)
    pid[0] = 3
    ev.analyze_wf_z(wf, c, z, z + 10.0, additional_fields=[pid])
    allz = ev.z_binned_metric_pairs[-1].aggregators[0]
    assert allz.count[0].sum() == 2 * N  # "any" fed both PMT sides
    ev.dump_wf_z()
    assert any(k.startswith("allz_") for k in logger.figures)


def test_z_evaluator_nn_E_series_uses_cal_E_when_true_E_missing(tmp_path,
                                                                monkeypatch,
                                                                rng):
    """Regression: in the production trainer path E is never passed, so the
    NN deviation accumulator must fall back to the CALIBRATED E (ref
    ZEvaluatorWF.add sets E = z_from_cal(...)'s cal_E before the NN
    z_deviation_with_E, ZEvaluator.py:543-555) — previously the nn-side
    single/dual_mae_E series was identically zero beside a real cal curve."""
    from waveformml_tpu.evaluation.z_eval import ZEvaluatorWF
    from waveformml_tpu.io.sql import write_synthetic_caldb
    from waveformml_tpu.ops.sparse import consecutive_event_index

    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "ecal", seed=3)
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    ev = ZEvaluatorWF(FakeLogger(), calgroup="ecal")
    B = 20
    rows = [[int(rng.integers(0, NX)), int(rng.integers(0, NY)), e]
            for e in range(B)]
    coords = np.asarray(rows, dtype=np.int32)
    n = coords.shape[0]
    b = consecutive_event_index(coords[:, 2])
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    tvals = rng.uniform(0.2, 0.8, n)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = np.clip(
        tvals + rng.normal(0, 0.05, n), 0, 1)
    feats = rng.random((n, 130)).astype(np.float32) * 0.05
    ev.add(pred, target, coords, f=feats)  # NO true E
    nn_counts = (ev.dev.E_mult["single"][1].sum()
                 + ev.dev.E_mult["dual"][1].sum())
    cal_counts = (ev.dev_cal.E_mult["single"][1].sum()
                  + ev.dev_cal.E_mult["dual"][1].sum())
    assert cal_counts > 0
    assert nn_counts == cal_counts  # NN binned by the same cal_E rows


def test_energy_wf_bins_mape_by_cal_z_without_z_pred(tmp_path, monkeypatch,
                                                     rng):
    """Regression: the WF energy evaluator bins the MAPE by the CALIBRATION
    z (ref EnergyEvaluatorWF.add feeds z_E_from_cal's Z into
    E_deviation_with_z, EnergyEvaluator.py:127-146) — no NN z required."""
    from waveformml_tpu.evaluation.energy_eval import EnergyEvaluatorWF
    from waveformml_tpu.io.sql import write_synthetic_caldb
    from waveformml_tpu.ops.sparse import consecutive_event_index

    caldb = str(tmp_path / "cal.db")
    write_synthetic_caldb(caldb, "ecal2", seed=5)
    monkeypatch.setenv("PROSPECT_CALDB", caldb)
    ev = EnergyEvaluatorWF(FakeLogger(), calgroup="ecal2")
    B = 16
    rows = [[int(rng.integers(0, NX)), int(rng.integers(0, NY)), e]
            for e in range(B)]
    coords = np.asarray(rows, dtype=np.int32)
    n = coords.shape[0]
    b = consecutive_event_index(coords[:, 2])
    target = np.zeros((B, 1, NX, NY))
    pred = np.zeros((B, 1, NX, NY))
    tvals = rng.uniform(0.2, 0.8, n)
    target[b, 0, coords[:, 0], coords[:, 1]] = tvals
    pred[b, 0, coords[:, 0], coords[:, 1]] = np.clip(
        tvals + rng.normal(0, 0.05, n), 0, 1)
    feats = rng.random((n, 130)).astype(np.float32) * 0.05
    ev.add(pred, target, coords, f=feats)  # no z_pred
    assert sum(c.sum() for c in ev.z_mape.count) > 0
    assert sum(c.sum() for c in ev.Ez_2d.count) > 0
    # the cal-E baseline also runs without a NN z on the WF path
    assert sum(c.sum() for c in ev.E_mape_cal.count) > 0


def test_seg_evaluator_add_batch_routes_pid(rng):
    """Regression: add_batch must route the dataset's extra_PID into the
    per-class split (ref SegEvaluator.add reads additional_fields,
    SegEvaluator.py:73-85) — previously every row accumulated under
    class 0 ('Ionization')."""
    from waveformml_tpu.evaluation.seg_eval import SegEvaluator

    ev = SegEvaluator(FakeLogger())
    N = 30
    coords = np.stack([rng.integers(0, NX, N), rng.integers(0, NY, N),
                       np.arange(N)], axis=1).astype(np.int32)
    db = {
        "mask": np.ones((1, N), dtype=bool),
        "coords": coords[None],
        "labels_rows": rng.random((1, N)).astype(np.float32),
        "extra_PID": np.full((1, N), 4, dtype=np.int32),  # raw 4 → Recoil
    }
    test_out = {"predictions": rng.random((1, N)).astype(np.float32)}
    ev.add_batch(None, db, test_out)
    ci_recoil = ev.class_names.index("Recoil")
    ci_ioni = ev.class_names.index("Ionization")
    assert ev.error.error_hist[ci_recoil].sum() == N
    assert ev.error.error_hist[ci_ioni].sum() == 0
