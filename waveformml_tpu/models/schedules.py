"""Channel-schedule helpers shared by the conv block generators
(ref: src/models/SPConvBlocks.py:389-408 _get_frame_expansion/_contraction)."""
from __future__ import annotations

from math import floor
from typing import List


def get_frame_expansion(initial_number: int, factor: float, n: int,
                        use_round: bool = False) -> List[int]:
    frames = [initial_number]
    diff = float(int(round(factor * initial_number)) - initial_number) / n
    for _ in range(n):
        nxt = frames[-1] + diff
        frames.append(int(round(nxt)) if use_round else int(floor(nxt)))
    return frames[1:]


def get_frame_contraction(initial_number: int, nout: int, n: int,
                          use_round: bool = False) -> List[int]:
    frames = [initial_number]
    diff = float(initial_number - nout) / n
    for _ in range(n):
        nxt = frames[-1] - diff
        frames.append(int(round(nxt)) if use_round else int(floor(nxt)))
    return frames[1:]
