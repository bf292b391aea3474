import numpy as np
import pytest

from waveformml_tpu.ops import dsp
from waveformml_tpu.ops.pallas_dsp import (
    waveform_features_jax, waveform_features_pallas)


def _waveforms(rng, n=64, S=128):
    t = np.arange(S, dtype=np.float64)
    wfs = []
    for _ in range(n):
        t0 = rng.uniform(8, 40)
        amp = rng.uniform(50, 400)
        tail = rng.uniform(0.1, 0.4)
        shape = np.clip(1 - np.exp(-np.clip(t - t0, 0, None) / 1.5), 0, None) * \
            ((1 - tail) * np.exp(-np.clip(t - t0, 0, None) / 3.0)
             + tail * np.exp(-np.clip(t - t0, 0, None) / 25.0))
        wfs.append(amp * shape + rng.normal(0, 0.5, S).clip(0))
    return np.stack(wfs).astype(np.float32)


def test_jax_features_match_numpy_oracle(rng):
    wfs = _waveforms(rng)
    arrival, psd, total, peak = map(np.asarray, waveform_features_jax(wfs))
    for i in range(len(wfs)):
        a_ref = dsp.calc_arrival(wfs[i].astype(np.float64))
        assert arrival[i] == pytest.approx(a_ref, abs=1e-3), i
        psd_ref = dsp.calc_psd(wfs[i].astype(np.float64), a_ref)
        assert psd[i] == pytest.approx(psd_ref, rel=1e-3, abs=1e-4), i
        assert total[i] == pytest.approx(wfs[i].sum(), rel=1e-5)
        assert peak[i] == pytest.approx(wfs[i].max(), rel=1e-6)


def test_pallas_interpret_matches_jax(rng):
    """Pallas kernel in interpreter mode (CPU) equals the JAX implementation."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    wfs = _waveforms(rng, n=40, S=128)  # non-multiple of tile → padding path
    ref = [np.asarray(x) for x in waveform_features_jax(wfs)]
    with pltpu.force_tpu_interpret_mode():
        got = [np.asarray(x) for x in waveform_features_pallas(wfs)]
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g, r, rtol=1e-5, atol=1e-5)
