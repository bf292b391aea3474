import numpy as np
import pytest

from waveformml_tpu.ops import dsp


def test_moment_matches_numpy():
    rng = np.random.default_rng(0)
    data = rng.normal(2.0, 1.5, 100)
    svar, skew, curt = dsp.moment(data, 100)
    assert svar == pytest.approx(np.var(data, ddof=1), rel=1e-6)
    # reference conventions (SparseUtils.py:13-68): sample variance in the
    # denominators, count n in the prefactor, excess kurtosis
    d = data - data.mean()
    assert skew == pytest.approx(
        (d ** 3).sum() / (100 * svar ** 1.5), rel=1e-6)
    assert curt == pytest.approx(
        (d ** 4).sum() / (100 * svar ** 2) - 3.0, rel=1e-6)


def test_get_bin_index_edges():
    idx = dsp.get_bin_index(np.array([-1.0, 0.0, 0.5, 4.9, 5.0, 99.0]), 0.0, 5.0, 5)
    np.testing.assert_array_equal(idx, [0, 1, 1, 5, 6, 6])


def test_hist_add_1d():
    out = np.zeros(7)
    dsp.hist_add_1d(np.array([0.1, 0.2, 3.3, -5.0, 10.0]), out, (0, 5), 5)
    assert out[0] == 1      # underflow
    assert out[1] == 2
    assert out[4] == 1
    assert out[6] == 1      # overflow


def test_confusion_accumulate():
    out = np.zeros((3, 3))
    dsp.confusion_accumulate(np.array([0, 1, 1, 2]), np.array([0, 1, 2, 2]), out)
    assert out[0, 0] == 1 and out[1, 1] == 1 and out[2, 1] == 1 and out[2, 2] == 1


def test_welford_matches_direct():
    rng = np.random.default_rng(1)
    results = rng.normal(size=500)
    params = rng.uniform(0, 10, 500)
    mean = np.zeros(12)
    count = np.zeros(12)
    m2 = np.zeros(12)
    # accumulate in two chunks — merging must match single-pass
    dsp.welford_accumulate_1d(results[:250], params[:250], mean, count, m2, (0, 10), 10)
    dsp.welford_accumulate_1d(results[250:], params[250:], mean, count, m2, (0, 10), 10)
    idx = dsp.get_bin_index(params, 0, 10, 10)
    for b in range(12):
        sel = results[idx == b]
        if len(sel):
            assert mean[b] == pytest.approx(sel.mean(), abs=1e-9)
            assert m2[b] == pytest.approx(((sel - sel.mean()) ** 2).sum(), abs=1e-6)
    std = dsp.finalize_welford(count, m2)
    for b in range(12):
        sel = results[idx == b]
        if len(sel) > 1:
            assert std[b] == pytest.approx(sel.std(ddof=1), abs=1e-6)


def test_calc_arrival():
    wf = np.array([0, 0, 1, 4, 10, 8, 3, 1], dtype=float)
    # peak 10, thresh 5: crossing between idx 3 (4) and 4 (10)
    expect = 4 + (5 - 10) / (10 - 4) + 1  # i=4: i + (t - f[3])/(f[4]-f[3])
    a = dsp.calc_arrival(wf)
    assert a == pytest.approx(4 + (5 - 4) / (10 - 4) - 1 + 1)
    # batch version agrees
    ab = dsp.calc_arrival_batch(wf[None, :])
    assert ab[0] == pytest.approx(a)


def test_calc_arrival_from_peak():
    wf = np.array([0, 0, 1, 4, 10, 8, 3, 1], dtype=float)
    a = dsp.calc_arrival_from_peak(wf, 4)
    assert a == pytest.approx(dsp.calc_arrival(wf))


def test_integrate_lininterp_vs_exact():
    v = np.ones(20)
    # integral of a constant-1 signal over [2.25, 7.75] ≈ 5.5 + boundary terms
    s = dsp.integrate_lininterp_range(v, 2.25, 7.75)
    assert 5.0 < s < 7.0


def test_lin_interp_and_inverse():
    xy = np.array([[0.0, 0.0], [1.0, 10.0], [2.0, 20.0]])
    assert dsp.lin_interp(xy, 0.5) == pytest.approx(5.0)
    assert dsp.lin_interp(xy, 5.0) == pytest.approx(20.0)  # flat extrapolation
    assert dsp.lin_interp_inverse(xy, 15.0) == pytest.approx(1.5)


def test_find_peaks_two_peaks():
    wf = np.zeros(100)
    wf[20] = 10.0
    wf[19] = 5.0
    wf[21] = 5.0
    wf[60] = 8.0
    wf[59] = 4.0
    wf[61] = 4.0
    gmax, locs = dsp.find_peaks(wf, sep=10)
    assert gmax == 20
    assert locs[0] == 20 and locs[1] == 60


def test_find_peaks_separation_rejects_close():
    wf = np.zeros(100)
    wf[20] = 10.0
    wf[30] = 8.0   # within sep*2 of 20 with sep=10
    wf[19] = wf[21] = wf[29] = wf[31] = 1.0
    gmax, locs = dsp.find_peaks(wf, sep=10)
    assert locs[0] == 20
    assert 30 not in locs[locs >= 0][1:]


def test_find_peaks_plateau():
    wf = np.zeros(50)
    wf[10:14] = 5.0  # plateau: peak at midpoint
    gmax, locs = dsp.find_peaks(wf, sep=3)
    assert 10 <= locs[0] <= 13


def test_cull_peaks():
    from waveformml_tpu.detector import MAX_RANGE

    wf = np.zeros(50)
    wf[10] = 40.0 / MAX_RANGE   # above 30 ADC → kept
    wf[30] = 5.0 / MAX_RANGE    # too small → culled
    peaks = np.array([10, 30, -1, -1, -1])
    culled = dsp.cull_peaks(peaks, wf, max_loc=10)
    assert culled[0] == 10 and culled[1] == -1


def test_match_and_excluded():
    small = np.array([10, 50])
    large = np.array([12, 30, 52])
    inds = dsp.match_peaks(small, large)
    np.testing.assert_array_equal(inds, [0, 2])
    exc = dsp.excluded_inds(inds, 3)
    np.testing.assert_array_equal(exc, [1])


def test_average_median():
    v = np.array([100.0, 1, 2, 3, 4, 5, -50])
    m = dsp.average_median(v)
    assert 1 <= m <= 5  # outliers trimmed


def test_align_wfs():
    wfs = np.zeros((2, 20))
    wfs[0, 5] = 1.0
    wfs[1, 12] = 1.0
    out = dsp.align_wfs(wfs, np.array([5.0, 12.0]), target=10)
    assert out[0, 10] == 1.0 and out[1, 10] == 1.0


def test_peak_interpolate():
    wf = np.array([0.0, 3.0, 4.0, 3.0, 0.0])
    assert dsp.peak_interpolate(wf, 2) == pytest.approx(2.0)
    wf2 = np.array([0.0, 3.0, 4.0, 3.9, 0.0])
    assert 2.0 < dsp.peak_interpolate(wf2, 2) < 3.0


def test_average_pulse_event_summary(rng):
    from waveformml_tpu.detector import NX, NY

    coords = np.array([[1, 1, 0], [2, 2, 0], [5, 5, 1]], dtype=np.int32)
    pulses = np.zeros((3, 20))
    pulses[:, 4] = 10.0
    pulses[:, 5] = 6.0
    pulses[:, 14] = 8.0
    gains = np.ones((NX, NY, 2))
    seg_status = np.zeros((NX, NY))
    seg_status[1, 1] = 0.5
    out = dsp.average_pulse(coords, pulses, gains, np.arange(10, dtype=float),
                            seg_status, n_events=2)
    np.testing.assert_array_equal(out["multiplicity"], [2, 1])
    np.testing.assert_array_equal(out["n_SE"], [1, 0])
    assert out["pulses"][0, 4] == pytest.approx(20.0)  # summed over the event
    # energy-weighted coords between the two sites
    assert 1.0 <= out["coords"][0, 0] <= 2.0


def test_weighted_average_quantities():
    coords = np.array([[1, 1, 0], [3, 3, 0]], dtype=np.int32)
    q = np.array([[2.0, 2.0],      # E
                  [0.2, 0.4]])     # psd
    out_c, out_q, out_m = dsp.weighted_average_quantities(coords, q, 1)
    assert out_q[0, 0] == pytest.approx(4.0)   # total E
    assert out_q[1, 0] == pytest.approx(0.3)   # E-weighted psd
    assert out_m[0] == 2


def test_get_bin_index_nonfinite_routes_to_margin_bins():
    # ref SparseUtils.py:139-154: NaN fails every scan comparison so
    # bin_index stays 0; -inf underflows, +inf overflows. The vectorized
    # cast must not emit an invalid-cast RuntimeWarning either.
    import warnings

    vals = np.array([np.nan, -np.inf, np.inf, 2.5])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        idx = dsp.get_bin_index(vals, 0.0, 5.0, 5)
    np.testing.assert_array_equal(idx, [0, 0, 6, 3])


def test_hist_add_1d_nan_counts_underflow():
    out = np.zeros(7, dtype=np.int64)
    dsp.hist_add_1d(np.array([np.nan, 1.0, np.inf]), out, (0.0, 5.0), 5)
    assert out[0] == 1 and out[6] == 1 and out.sum() == 3
