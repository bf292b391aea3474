import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY, Z_SCALE
from waveformml_tpu.ops.calibration import (
    CalibrationTables, E_basic_prediction, calc_calib_z_E, dt_to_z,
    make_synthetic_tables, peak_to_dt, peak_to_z, z_basic_prediction,
    z_basic_prediction_dense, z_from_total_light)


@pytest.fixture(scope="module")
def cal():
    return make_synthetic_tables()


def _pulse_pair(n_samples, amp_l, amp_r, t0=20.0):
    """Single scintillation-like pulse pair."""
    t = np.arange(n_samples, dtype=np.float64)
    shape = np.clip(1 - np.exp(-np.clip(t - t0, 0, None) / 1.5), 0, None) \
        * np.exp(-np.clip(t - t0, 0, None) / 8.0)
    wf = np.concatenate([amp_l * shape, amp_r * shape])
    return wf


def test_z_from_total_light_recovers_position(cal):
    n = 64
    # amplitude ratio exp(±0.8 z/600): z=300 → R = log(r/l) = 0.8
    z_true = 300.0
    amp_l = np.exp(-0.8 * z_true / 600)
    amp_r = np.exp(+0.8 * z_true / 600)
    wf = _pulse_pair(n, amp_l, amp_r)
    z, w, E = z_from_total_light(wf, 3, 4, cal, n)
    # light_pos curve maps R = 1.6 z/1200 → z, and log(r/l) = 1.6*300/1200*...
    assert z == pytest.approx(z_true, abs=30)
    assert w > 0


def test_z_from_total_light_single_sided(cal):
    n = 64
    wf = _pulse_pair(n, 1.0, 0.0)
    z, w, E = z_from_total_light(wf, 0, 0, cal, n)
    assert z == 0.0
    assert w == pytest.approx(1e-5)


def test_peak_to_z_and_dt(cal):
    n = 64
    wf = _pulse_pair(n, 1.0, 1.0)
    m = int(np.argmax(wf[:n]))
    z, E = peak_to_z(wf, m, m, 2, 2, cal, n)
    assert abs(z) < 100  # symmetric amplitudes → near center
    dt, L = peak_to_dt(wf, m, m, 2, 2, cal, n)
    assert dt == pytest.approx(0.0, abs=1e-6)
    assert L > 0


def test_calc_calib_z_E_full_chain(cal):
    n = 64
    z_true = -240.0
    amp_l = 300 * np.exp(-0.8 * z_true / 600)
    amp_r = 300 * np.exp(+0.8 * z_true / 600)
    wf = _pulse_pair(n, amp_l, amp_r) / (2 ** 14 - 1)
    coords = np.array([[4, 5, 0]], dtype=np.int32)
    z_out = np.zeros((1, NX, NY))
    E_out = np.zeros((1, NX, NY))
    calc_calib_z_E(coords, wf[None, :], z_out, E_out, cal, Z_SCALE, n)
    got_z = (z_out[0, 4, 5] - 0.5) * Z_SCALE
    assert got_z == pytest.approx(z_true, abs=60)
    assert E_out[0, 4, 5] > 0


def test_calc_calib_z_E_one_sided(cal):
    n = 64
    wf = _pulse_pair(n, 400.0, 0.0) / (2 ** 14 - 1)
    coords = np.array([[1, 1, 0]], dtype=np.int32)
    z_out = np.zeros((1, NX, NY))
    E_out = np.zeros((1, NX, NY))
    calc_calib_z_E(coords, wf[None, :], z_out, E_out, cal, Z_SCALE, n)
    assert z_out[0, 1, 1] == 0.5  # unknown position marker
    assert E_out[0, 1, 1] > 0


def test_E_basic_prediction_single_ended(cal):
    coo = np.array([[0, 0, 0], [1, 1, 0]], dtype=np.int32)
    seg_status = np.zeros((NX, NY))
    seg_status[1, 1] = 0.5
    E = np.array([5.0, 0.0])
    PE0 = np.array([0.0, 100.0])
    PE1 = np.array([0.0, 0.0])
    z = np.array([0.0, 200.0])
    pred = np.zeros(2)
    E_basic_prediction(coo, E, PE0, PE1, z, seg_status,
                       cal.light_pos_curves, cal.light_sum_curves, pred)
    assert pred[0] == 5.0  # double-ended passthrough
    assert pred[1] > 100.0  # reconstructed total > single PMT


def test_z_basic_prediction_neighbor_fill():
    coo = np.array([[3, 3, 0], [4, 4, 0], [2, 2, 0]], dtype=np.int32)
    feat = np.array([0.5, 0.7, 0.3])
    pred = np.zeros(3)
    z_basic_prediction(coo, feat, pred)
    assert pred[1] == 0.7 and pred[2] == 0.3
    assert pred[0] == pytest.approx(0.5 * (0.7 + 0.3))


def test_z_basic_prediction_dense_diagonal():
    coo = np.array([[3, 3, 0], [4, 4, 0]], dtype=np.int32)
    z_pred = np.full((1, NX, NY), 0.0)
    z_pred[0, 3, 3] = 0.5   # unknown
    z_pred[0, 4, 4] = 0.8   # known diagonal neighbor
    z_basic_prediction_dense(coo, z_pred)
    assert z_pred[0, 3, 3] == pytest.approx(0.8)


def test_calc_calib_z_E_fuzz_bounds(cal, rng):
    """Property fuzz: on random pulse mixtures the classical chain never
    produces NaN/inf, z stays in [0, 1] (normalized), and E is nonnegative
    wherever a pulse was reconstructed."""
    n_samples = 65
    for trial in range(20):
        n_pulses = int(rng.integers(1, 6))
        coords, wfs = [], []
        for p in range(n_pulses):
            x = int(rng.integers(0, NX))
            y = int(rng.integers(0, NY))
            kind = trial % 4
            if kind == 0:
                wf = _pulse_pair(n_samples, rng.uniform(50, 4000),
                                 rng.uniform(50, 4000), t0=rng.uniform(5, 50))
            elif kind == 1:  # two pulses per waveform (peak matching path)
                wf = (_pulse_pair(n_samples, 500, 700, t0=10)
                      + _pulse_pair(n_samples, 300, 200, t0=40))
            elif kind == 2:  # one-sided pulse (dead-PMT path)
                wf = _pulse_pair(n_samples, rng.uniform(100, 1000), 0.0)
            else:            # noise only
                wf = np.abs(rng.normal(0, 2.0, 2 * n_samples))
            coords.append([x, y, 0])
            wfs.append(wf)
        coords = np.asarray(coords, np.int64)
        wfs = np.asarray(wfs)
        z = np.zeros((1, NX, NY))
        E = np.zeros((1, NX, NY))
        calc_calib_z_E(coords, wfs, z, E, cal, Z_SCALE, n_samples)
        assert np.isfinite(z).all() and np.isfinite(E).all(), trial
        filled = E != 0
        assert (z[filled] >= -0.5).all() and (z[filled] <= 1.5).all(), \
            (trial, z[filled])
        assert (E[filled] > -1e-9).all(), trial


def test_calc_calib_z_E_separated_baselines(cal):
    """z_dt_out / z_light_out receive the two ingredient positions peak_to_z
    combines (ref SparseUtils.py:797-845): the light-ratio z must track the
    amplitude asymmetry, and both must bracket plausible positions."""
    n = 64
    z_true = -240.0
    amp_l = 300 * np.exp(-0.8 * z_true / 600)
    amp_r = 300 * np.exp(+0.8 * z_true / 600)
    wf = _pulse_pair(n, amp_l, amp_r) / (2 ** 14 - 1)
    coords = np.array([[4, 5, 0]], dtype=np.int32)
    z_out = np.zeros((1, NX, NY))
    E_out = np.zeros((1, NX, NY))
    z_dt = np.full((1, NX, NY), 0.5)
    z_light = np.full((1, NX, NY), 0.5)
    calc_calib_z_E(coords, wf[None, :], z_out, E_out, cal, Z_SCALE, n,
                   z_dt_out=z_dt, z_light_out=z_light)
    got_light = (z_light[0, 4, 5] - 0.5) * Z_SCALE
    assert got_light == pytest.approx(z_true, abs=60)
    # the combined z is an inverse-variance mix of the two ingredients
    lo = min(z_dt[0, 4, 5], z_light[0, 4, 5]) - 1e-9
    hi = max(z_dt[0, 4, 5], z_light[0, 4, 5]) + 1e-9
    assert lo <= z_out[0, 4, 5] <= hi
    # without separated outputs the combined result is unchanged
    z2 = np.zeros((1, NX, NY)); E2 = np.zeros((1, NX, NY))
    calc_calib_z_E(coords, wf[None, :], z2, E2, cal, Z_SCALE, n)
    np.testing.assert_allclose(z2, z_out)
    np.testing.assert_allclose(E2, E_out)
