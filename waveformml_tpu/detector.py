"""PROSPECT detector geometry constants.

The reference hard-codes these throughout (nx=14, ny=11:
src/engineering/LitBase.py:20-21, src/evaluation/AD1Evaluator.py:34-35,
src/models/SCNet.py:59-61; 14-bit ADC MAX_RANGE: src/datasets/HDF5Dataset.py:15-17;
z cell length / normalization scales: src/evaluation/AD1Evaluator.py:14-16).
Centralized here instead.
"""

NX = 14            # detector segments in x
NY = 11            # detector segments in y
N_SITES = NX * NY  # 154 grid sites
N_PMT = 2          # PMTs per segment (double-ended readout)

ADC_BITS = 14
MAX_RANGE = 2 ** ADC_BITS - 1  # 16383

Z_FULL = 1176.0    # segment length in mm (ref: AD1Evaluator.py:14)
Z_SCALE = 1200.0   # z normalization scale (ref: AD1Evaluator.py:15)
E_SCALE = 12.0     # energy normalization scale (ref: AD1Evaluator.py:16)

SAMPLE_TIME_NS = 4.0  # ADC sample period in ns (ref: AD1Evaluator.py sample width)


def seg_to_xy(seg):
    """Segment number → (x, y) grid coordinates (ref: AD1Evaluator dimensions)."""
    return seg % NX, seg // NX


def xy_to_seg(x, y):
    return y * NX + x


def det_to_seg_side(det):
    """Detector channel number → (segment, side). Channels are 2*seg + side
    (ref: src/engineering/LitZ.py:11-26 create_coord_from_det)."""
    return det // 2, det % 2
