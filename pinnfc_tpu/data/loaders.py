"""Raw .mat ingestion with the reference's channel selection and filters.

Normal data (reference 01:115-154): variables ``I, m_W, T_W_in, P_H_in,
P_O_in, T_W_out, m_H2, m_O2`` form the 8 input channels, ``U`` is the target,
and rows are kept only when 50 < I < 800 (01:143).

Fault data (reference 01:157-187): a single ``segment_double`` matrix,
columns selected by ``corr_index = [20,25,65,68,69,66,14,16] - 3`` (01:172),
target column ``19 - 3`` (01:176), rows kept when the second selected channel
(current) is non-zero (01:180-181).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import scipy.io

NORMAL_X_KEYS = ("I", "m_W", "T_W_in", "P_H_in", "P_O_in", "T_W_out", "m_H2", "m_O2")
NORMAL_Y_KEY = "U"
FAULT_CORR_INDEX = np.array([20, 25, 65, 68, 69, 66, 14, 16]) - 3
FAULT_Y_INDEX = 19 - 3


def _as_col(a: np.ndarray) -> np.ndarray:
    """Channel vector → (N, 1) column.  MATLAB stores vectors as (N, 1) or
    (1, N) depending on origin; both flatten to the same channel."""
    return np.asarray(a).reshape(-1, 1)


def load_normal_mat(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a normal-operation .mat file → (X (N,8), Y (N,1))."""
    data = scipy.io.loadmat(path)
    cols = [_as_col(data[k]) for k in NORMAL_X_KEYS]
    x = np.column_stack(cols)
    y = _as_col(data[NORMAL_Y_KEY])
    current = x[:, 0]
    valid = np.where((current > 50) & (current < 800))[0]
    return x[valid], y[valid]


def load_fault_mat(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Load a fault-segment .mat file → (X (N,8), Y (N,1))."""
    data = scipy.io.loadmat(path)["segment_double"]
    x = data[:, FAULT_CORR_INDEX]
    y = data[:, [FAULT_Y_INDEX]]
    # Reference filters on X column 1 (01:180) — after corr_index selection
    # that is COOLANT FLOW (contract channel x1), even though the upstream
    # comment says it "assumes current is in column 2" (01:179); the
    # current is x[:, 0].  Quirk kept verbatim for parity: zero-current
    # fault rows survive, only zero-coolant-flow rows are dropped.
    valid = np.where(x[:, 1] != 0)[0]
    return x[valid], y[valid]
