"""Fuzz the vectorized DSP ports against their scalar oracles on adversarial
inputs (zeros, constants, plateaus, ties, spikes, negative baselines)."""
import numpy as np
import pytest

from waveformml_tpu.ops import dsp
from waveformml_tpu.ops.pallas_dsp import waveform_features_jax


def _adversarial_waveforms(rng, n=200, S=64):
    out = []
    for i in range(n):
        kind = i % 8
        if kind == 0:
            w = np.zeros(S)
        elif kind == 1:
            w = np.full(S, float(rng.uniform(0, 10)))          # constant
        elif kind == 2:
            w = np.zeros(S); w[int(rng.integers(0, S))] = 100  # delta spike
        elif kind == 3:
            w = np.zeros(S)                                    # plateau peak
            a = int(rng.integers(0, S - 6))
            w[a:a + 5] = 50.0
        elif kind == 4:
            w = rng.normal(0, 1, S)                            # pure noise ±
        elif kind == 5:
            t = np.arange(S)
            t0 = rng.uniform(1, S - 2)
            w = 100 * np.exp(-np.clip(t - t0, 0, None) / 5) * (t >= t0)
        elif kind == 6:
            w = np.tile([0.0, 30.0], S // 2)                   # tie comb
        else:
            t = np.arange(S, dtype=float)
            w = rng.uniform(10, 300) * np.clip(
                1 - np.exp(-np.clip(t - 8, 0, None) / 1.5), 0, None) \
                * np.exp(-np.clip(t - 8, 0, None) / 12)
        out.append(w)
    return np.asarray(out)


def test_calc_arrival_batch_matches_scalar(rng):
    wfs = _adversarial_waveforms(rng)
    batch = dsp.calc_arrival_batch(wfs)
    for i in range(len(wfs)):
        want = dsp.calc_arrival(wfs[i])
        assert batch[i] == pytest.approx(want, abs=1e-9), (i, wfs[i][:8])


def test_waveform_features_matches_oracles_on_adversarial(rng):
    wfs = _adversarial_waveforms(rng).astype(np.float32)
    arr, psd, tot, peak = (np.asarray(x) for x in
                           waveform_features_jax(wfs))
    for i in range(len(wfs)):
        w = wfs[i].astype(np.float64)
        assert peak[i] == pytest.approx(w.max(), rel=1e-5, abs=1e-5), i
        assert tot[i] == pytest.approx(w.sum(), rel=1e-4, abs=1e-3), i
        a_ref = dsp.calc_arrival(w)
        assert arr[i] == pytest.approx(a_ref, abs=1e-2), (i, a_ref)
        psd_ref = dsp.calc_psd(w, a_ref)
        assert psd[i] == pytest.approx(psd_ref, rel=1e-3, abs=1e-3), i
        assert 0.0 <= psd[i] <= 1.0 or psd[i] == pytest.approx(psd_ref, abs=1e-3)


def test_find_peaks_properties(rng):
    """find_peaks invariants on fuzzed inputs: indices in range, separated by
    > sep·2? (reference greedy selection), descending amplitude order."""
    for i in range(100):
        S = int(rng.integers(16, 128))
        v = rng.normal(0, 1, S).cumsum()  # random walk → plateaus and trends
        v = v - v.min()
        sep = int(rng.integers(1, 5))
        maxpos, peaks = dsp.find_peaks(v, sep)
        got = dsp.strip_sentinel(peaks)
        if got is None:
            continue
        assert 0 <= maxpos < S and maxpos == got[0]
        assert ((got >= 0) & (got < S)).all()
        amps = v[got]
        assert (np.diff(amps) <= 1e-12).all(), (v, got)  # descending
        # pairwise separation respects the reference rule (> sep*2)
        for a in got:
            for b in got:
                if a != b:
                    assert abs(int(a) - int(b)) > sep * 2, (got, sep)


def test_integrate_lininterp_range_bounds(rng):
    """Integral over a sub-range never exceeds the full sum for nonnegative
    waveforms; degenerate ranges integrate ~0."""
    for _ in range(50):
        S = 32
        v = np.abs(rng.normal(0, 1, S))
        r0 = float(rng.uniform(0, S - 2))
        r1 = float(rng.uniform(r0, S - 1))
        val = dsp.integrate_lininterp_range(v, r0, r1)
        assert val <= v.sum() + 1e-9
        assert dsp.integrate_lininterp_range(v, r0, r0) == pytest.approx(0, abs=1e-9)
