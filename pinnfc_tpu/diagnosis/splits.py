"""Stratified train/test splitting (sklearn ``train_test_split`` semantics).

Scripts 02/03/05 all split with ``train_test_split(..., stratify=y,
random_state)`` (02:522, 03:533-535, 05:627-633).  sklearn is available in
the image and is used directly — the split is a one-off CPU index
permutation, not compute-path work; keeping the identical implementation
preserves the reference's exact row selection for parity checks.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def stratified_split(
    *arrays,
    y: np.ndarray,
    test_size: float,
    random_state: int,
) -> Tuple:
    """Thin wrapper over sklearn's splitter returning (train..., test...)
    interleaved exactly like ``train_test_split``."""
    from sklearn.model_selection import train_test_split

    return train_test_split(
        *arrays, test_size=test_size, random_state=random_state, stratify=y
    )
