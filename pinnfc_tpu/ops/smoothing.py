"""Segment-aware centered moving averages.

The reference smooths the two uncertainty channels per fault segment with a
pandas centered rolling mean, ``min_periods=1`` (01:1830-1872).  The pandas
window convention for width ``w`` centered at ``i`` is the inclusive index
range ``[i - w//2, i + (w-1)//2]``, truncated at the array edges; that exact
convention is reproduced here with an O(N) cumulative-sum formulation that
runs either in numpy (export path) or jnp (on-device path) — no Python loop
over rows, no loop over windows.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _centered_ma_cumsum(values, window: int, xp):
    """Centered rolling mean, pandas semantics, via cumulative sums."""
    n = values.shape[0]
    idx = xp.arange(n)
    # inclusive window [i - w//2, i + (w-1)//2], clipped to [0, n)
    start = xp.clip(idx - window // 2, 0, n)
    stop = xp.clip(idx + (window - 1) // 2 + 1, 0, n)  # exclusive
    csum = xp.concatenate([xp.zeros(1, dtype=values.dtype), xp.cumsum(values)])
    total = csum[stop] - csum[start]
    count = (stop - start).astype(values.dtype)
    return total / count


def centered_moving_average(values, window: int):
    """Pandas ``rolling(window, center=True, min_periods=1).mean()`` clone
    (reference ``_moving_average_centered``, 01:1830-1834).  Accepts numpy or
    jnp arrays and stays in that domain."""
    if isinstance(values, jnp.ndarray) and not isinstance(values, np.ndarray):
        return _centered_ma_cumsum(values.astype(jnp.float32), window, jnp)
    values = np.asarray(values, dtype=np.float64)
    if values.shape[0] == 0:
        return values
    return _centered_ma_cumsum(values, window, np)


def smooth_by_segments(
    values, boundary_lines: Sequence[int], window: int
):
    """Centered moving average applied independently per segment so smoothing
    never leaks across a fault boundary (reference 01:1848-1872).

    ``boundary_lines`` holds each segment's exclusive end index; the
    reference's tolerance behaviors are preserved: missing/short boundaries
    → smooth the whole array; overlong boundaries → drop out-of-range ones.
    """
    values = np.asarray(values, dtype=np.float64)
    n = values.shape[0]
    boundary_lines = list(boundary_lines or [])
    if not boundary_lines or boundary_lines[-1] < n:
        return centered_moving_average(values, window)
    if boundary_lines[-1] > n:
        boundary_lines = [b for b in boundary_lines if 0 < b <= n]
        # the filter can leave the tail [last, n) uncovered (or nothing at
        # all) — without this the loop below would return uninitialized
        # memory for those rows
        if not boundary_lines:
            return centered_moving_average(values, window)
        if boundary_lines[-1] != n:
            boundary_lines.append(n)

    out = np.empty_like(values)
    start = 0
    for end in boundary_lines:
        out[start:end] = centered_moving_average(values[start:end], window)
        start = end
    return out
