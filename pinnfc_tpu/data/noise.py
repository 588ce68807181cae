"""Data-level noise / fault injection (reference 01:59-112).

Optional Gaussian or uniform noise on the target, maskable by region —
the reference's only fault-injection machinery, kept as a first-class
module (SURVEY §5: failure-injection subsystem)."""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def add_noise(
    y: np.ndarray,
    noise_type: str = "gaussian",
    noise_level: float = 0.02,
    noise_target: str = "fault_only",
    seed: int = 42,
    normal_length: int | None = None,
) -> Tuple[np.ndarray, Dict]:
    """Add noise scaled by ``noise_level * std(y)``.

    ``noise_target``: 'fault_only' (rows past ``normal_length``), 'all',
    'normal_only', or 'random' (half the rows).  The reference leaves
    'fault_only' unimplemented ("pass", 01:84-87) pending external length
    info; here it works when ``normal_length`` is given and otherwise
    degrades to a no-op mask exactly like the reference.
    """
    rng = np.random.RandomState(seed)
    y = np.asarray(y, dtype=np.float64)
    noise_std = noise_level * np.std(y)

    if noise_type == "gaussian":
        noise = rng.normal(0.0, noise_std, y.shape)
    elif noise_type == "uniform":
        width = noise_std * np.sqrt(12.0)
        noise = rng.uniform(-width / 2.0, width / 2.0, y.shape)
    else:
        raise ValueError(f"Unsupported noise type: {noise_type}")

    mask = np.zeros(len(y), dtype=bool)
    if noise_target == "all":
        mask[:] = True
    elif noise_target == "random":
        idx = rng.choice(len(y), size=len(y) // 2, replace=False)
        mask[idx] = True
    elif noise_target == "fault_only":
        if normal_length is not None:
            mask[normal_length:] = True
    elif noise_target == "normal_only":
        if normal_length is not None:
            mask[:normal_length] = True
    else:
        raise ValueError(f"Unsupported noise target: {noise_target}")

    y_noisy = y.copy()
    y_noisy[mask] += noise[mask]
    info = {
        "noise_type": noise_type,
        "noise_level": noise_level,
        "noise_std": float(noise_std),
        "noise_mask": mask,
        "affected_samples": int(mask.sum()),
    }
    return y_noisy, info
