import numpy as np

from waveformml_tpu.io.compound_types import (
    DetPulseCoord, PhysPulse, Waveform, WaveformNorm, WaveformPairCal,
    WaveformPairNorm, extension_type_map,
)


def test_field_schemas_match_experiment_contract():
    """Field names/dtypes/lengths are the on-disk contract
    (ref: H5CompoundTypes.py:61-146)."""
    t = WaveformPairCal()
    assert t.names == ["evt", "t", "dt", "z", "E", "PSD", "PE", "coord", "waveform", "EZ", "PID"]
    assert t.type["waveform"].shape == (130,)
    assert t.type["waveform"].base == np.int16
    assert t.type["coord"].shape == (3,)
    assert t.event_index_name == "coord" and t.event_index_coord == 2

    n = WaveformPairNorm()
    assert n.type["pulse"].shape == (130,)
    assert n.type["phys"].shape == (7,)

    p = PhysPulse()
    assert "Esmear_SE" in p.names and p.type["PE"].shape == (2,)

    w = Waveform()
    assert w.type["waveform"].shape == (59,)
    assert w.event_index_name == "evt"

    d = DetPulseCoord()
    assert d.type["pulse"].shape == (7,)

    wn = WaveformNorm()
    assert wn.event_index_name == "evt" and wn.event_index_coord is None


def test_extension_map():
    assert extension_type_map("a_WFNorm.h5").name == "WaveformPairNorm"
    assert extension_type_map("a_Phys.h5").name == "PhysPulse"
    assert extension_type_map("a_WFCalFilteredSE.h5").name == "WaveformPairCal"


def test_generate_random_data_deterministic(rng):
    t = WaveformPairNorm()
    d1 = t.generate_random_data(16, np.random.default_rng(0))
    d2 = t.generate_random_data(16, np.random.default_rng(0))
    assert d1.shape == (16,)
    for name in t.names:
        np.testing.assert_array_equal(d1[name], d2[name])


def test_event_ids():
    t = WaveformPairCal()
    d = t.generate_random_data(8, np.random.default_rng(1))
    d["coord"][:, 2] = [0, 0, 1, 1, 1, 2, 3, 3]
    np.testing.assert_array_equal(t.event_ids(d), [0, 0, 1, 1, 1, 2, 3, 3])
