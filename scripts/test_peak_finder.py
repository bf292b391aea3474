#!/usr/bin/env python
"""Smoke test of the peak-finder kernel on a hand-written vector
(ref: scripts/test_peak_finder.py:7-25 — upgraded with real assertions)."""
from __future__ import annotations

import sys

import numpy as np


def main() -> int:
    from waveformml_tpu.ops.dsp import cull_peaks, find_peaks, strip_sentinel

    wf = np.zeros(100)
    wf[20], wf[19], wf[21] = 10.0, 5.0, 5.0
    wf[60], wf[59], wf[61] = 8.0, 4.0, 4.0
    wf[25] = 6.0  # within separation window of peak 20 → rejected
    gmax, locs = find_peaks(wf, sep=10)
    print("global max:", gmax, "selected peaks:", locs)
    assert gmax == 20
    assert locs[0] == 20 and locs[1] == 60
    assert 25 not in locs.tolist()
    culled = strip_sentinel(cull_peaks(locs, wf, gmax))
    print("culled:", culled)
    print("OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
