import numpy as np
import pytest

from waveformml_tpu.detector import NX, NY
from waveformml_tpu.evaluation.calibrator import Calibrator
from waveformml_tpu.io.sql import (
    CalCurve, CalibrationDB, WFParamsDB, get_gains, write_synthetic_caldb)


@pytest.fixture(scope="module")
def caldb_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cal") / "cal.db"
    write_synthetic_caldb(str(p), "testcal", seed=1)
    return str(p)


def test_calibration_db_reads(caldb_path):
    db = CalibrationDB(caldb_path, "testcal")
    assert db.calgroup_id is not None
    gains, eres, rel_times, seg_times = db.get_seg_cal_values()
    assert gains.shape == (NX, NY, 2)
    assert gains.min() > 0.5
    curves = db.get_curves()
    atten = curves[0]
    assert len(atten) == NX * NY * 2
    # attenuation curve evaluates to the generator's exp shape
    c = atten[0]
    c.sort()
    assert float(c.eval(0.0)) == pytest.approx(1.0, abs=0.05)


def test_unknown_calgroup(caldb_path):
    """An unknown calgroup fails at construction with the offending name —
    the old None return surfaced later as an opaque TypeError inside
    Calibrator/get_gains."""
    import pytest

    with pytest.raises(KeyError, match="nope"):
        CalibrationDB(caldb_path, "nope")


def test_get_gains_standalone(caldb_path):
    gains = get_gains(caldb_path, "testcal")
    assert gains.shape == (NX, NY, 2)
    assert (gains > 0).all()


def test_cal_curve_spline():
    c = CalCurve()
    for x in np.linspace(0, 10, 12):
        c.add_point(float(x), float(x ** 2), 0.0, 0.1)
    assert float(c.eval(3.0)) == pytest.approx(9.0, abs=0.5)


def test_calibrator_tables(caldb_path):
    db = CalibrationDB(caldb_path, "testcal")
    cal = Calibrator(db)
    # light-pos curve inverts the synthetic attenuation: logR = 1.6 z / 600
    xy = cal.light_pos_curves[3, 4]
    mid = len(xy) // 2
    z_at = np.interp(0.8, xy[:, 0], xy[:, 1])
    assert z_at == pytest.approx(300.0, abs=40)
    # time-pos: dt = t_r − t_l = −z/100 (source at +z reaches the right PMT
    # earlier) per the synthetic transit times
    txy = cal.time_pos_curves[3, 4]
    order = np.argsort(txy[:, 0])
    z_dt = np.interp(1.0, txy[order, 0], txy[order, 1])
    assert z_dt == pytest.approx(-100.0, abs=20)
    # packaged tables run the classical reconstruction end-to-end
    tables = cal.tables()
    from waveformml_tpu.detector import Z_SCALE
    from waveformml_tpu.ops.calibration import calc_calib_z_E

    n = 64
    z_true = 200.0
    amp_l = 300 * np.exp(-0.8 * z_true / 600)
    amp_r = 300 * np.exp(+0.8 * z_true / 600)
    t = np.arange(n, dtype=np.float64)
    shape = np.clip(1 - np.exp(-np.clip(t - 20, 0, None) / 1.5), 0, None) \
        * np.exp(-np.clip(t - 20, 0, None) / 8.0)
    wf = np.concatenate([amp_l * shape, amp_r * shape]) / (2 ** 14 - 1)
    coords = np.array([[3, 4, 0]], dtype=np.int32)
    z_out = np.zeros((1, NX, NY))
    E_out = np.zeros((1, NX, NY))
    calc_calib_z_E(coords, wf[None, :], z_out, E_out, tables, Z_SCALE, n)
    got = (z_out[0, 3, 4] - 0.5) * Z_SCALE
    assert got == pytest.approx(z_true, abs=80)


def test_wfparams_db(tmp_path):
    db = WFParamsDB(str(tmp_path / "wf.db"))
    db.create_table("param_set", ["id INTEGER PRIMARY KEY AUTOINCREMENT",
                                  "name TEXT", "rise REAL"])
    db.create_table("curve_diffs", ["param_set_id INTEGER", "calname TEXT",
                                    "seg INTEGER", "normed_diff REAL",
                                    "psd_nd0 REAL", "psd_nd1 REAL",
                                    "att_nd0 REAL", "att_nd1 REAL",
                                    "t_nd0 REAL", "t_nd1 REAL"])
    assert db.get_unique_name() == "WaveCal1"
    db.insert_set({"name": "WaveCal1", "rise": 1.5})
    db.commit()
    assert db.get_unique_name() == "WaveCal2"
    db.insert_eval_for_seg("calA", 3, 1, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6])
    db.commit()
    rows = db.query_smallest_diffs("calA", 3)
    assert len(rows) == 1
    assert rows[0][2] == pytest.approx(2.1)
