"""Shared TPU tiling constants for the Pallas kernels.

One definition of the lane/sublane geometry so sibling kernels can't
silently diverge on alignment rules.
"""

from __future__ import annotations

LANE = 128     # last-dim tile width (vector lanes)
SUBLANE = 8    # second-to-last-dim tile height (fp32 sublanes)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
