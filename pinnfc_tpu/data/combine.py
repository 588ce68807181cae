"""Dataset combination, normalization, split, labelling.

Mirrors reference ``combine_and_normalize_datasets`` (01:190-386):

- concatenate normal data + fault segments in load order;
- fit MinMax(-1, 1) scalers ONLY on the first ``n_train`` normal rows
  (01:266-274) — the quirk that makes fault data exceed [-1, 1];
- train set = those normal rows; test set = ALL rows, training rows
  included (01:285-289, preserved deliberately);
- record ``boundary_lines`` = cumulative segment end indices (01:334-338)
  and per-row fault labels (0 = normal, 1..K = segment order, 01:2013-2047).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.noise import add_noise
from pinnfc_tpu.data.scaling import AffineScaler


@dataclasses.dataclass
class DataInfo:
    """Split bookkeeping (reference ``data_info`` dict, 01:371-382)."""

    boundary_lines: List[int]  # cumulative end index of each segment
    segment_labels: List[str]  # fault segment names, load order
    normal_samples: int
    fault_samples: int
    train_indices: np.ndarray
    noise_info: Optional[Dict] = None

    def fault_labels(self, n_samples: int) -> np.ndarray:
        """Per-row labels: 0 normal, i+1 for fault segment i (01:2013-2047)."""
        labels = np.zeros(n_samples)
        for i in range(len(self.boundary_lines) - 1):
            labels[self.boundary_lines[i] : self.boundary_lines[i + 1]] = i + 1
        return labels


@dataclasses.dataclass
class FuelCellDataset:
    """The 7-tuple contract of the reference loader (01:386), typed."""

    x_train: jnp.ndarray  # (n_train, 8) normalized
    y_train: jnp.ndarray  # (n_train, 1) normalized
    x_test: jnp.ndarray  # (N, 8) normalized — includes train rows
    y_test: jnp.ndarray  # (N, 1) normalized
    scaler_x: AffineScaler
    scaler_y: AffineScaler
    info: DataInfo


def combine_and_normalize(
    normal_data: Tuple[np.ndarray, np.ndarray],
    fault_data_list: Sequence[Tuple[np.ndarray, np.ndarray, str]],
    training_rate: float = 1.0,
    noise_config: Optional[Dict] = None,
    seed: int = 42,
    scalers: Optional[Tuple[AffineScaler, AffineScaler]] = None,
) -> FuelCellDataset:
    """Combine segments and normalize (see module docstring).

    ``scalers=(scaler_x, scaler_y)`` skips the fit and normalizes through
    the GIVEN affine constants instead — the scoring path: a trained model
    operates in the normalized space defined by ITS OWN training campaign,
    so new measurements scored against a checkpoint must go through the
    checkpoint's scalers, never scalers re-fit on the new data (which would
    silently shift every input the model sees).  Fit-on-normal-train
    (01:266-274) remains the default when ``scalers`` is None."""
    x_normal, y_normal = normal_data
    x_normal = np.asarray(x_normal, np.float64)
    y_normal = np.asarray(y_normal, np.float64).reshape(-1, 1)

    xs = [x_normal]
    ys = [y_normal]
    labels: List[str] = []
    boundary_lines = [len(x_normal)]
    pos = len(x_normal)
    for x_f, y_f, label in fault_data_list:
        x_f = np.asarray(x_f, np.float64)
        y_f = np.asarray(y_f, np.float64).reshape(-1, 1)
        if x_f.shape[1] != x_normal.shape[1]:
            raise ValueError(
                f"fault segment '{label}' has {x_f.shape[1]} features, "
                f"expected {x_normal.shape[1]}"
            )
        xs.append(x_f)
        ys.append(y_f)
        labels.append(label)
        pos += len(x_f)
        boundary_lines.append(pos)

    x_combined = np.vstack(xs)
    y_combined = np.vstack(ys)

    noise_info = None
    if noise_config is not None:
        # Upstream quirk, deliberately NOT preserved: the reference calls
        # add_noise_to_combined_data (01:248) but then re-vstacks the CLEAN
        # Y right after (01:277-278), silently discarding the noise — the
        # feature is dead code there.  Here the injected noise actually
        # reaches y_train/y_test (like the fault_only repair in data.noise);
        # with noise_config=None (the reference main's setting, 01:2132)
        # both frameworks are identical.
        y_combined, noise_info = add_noise(
            y_combined, **noise_config, seed=seed, normal_length=len(x_normal)
        )

    n_train = int(len(x_normal) * training_rate)
    if n_train < 1:
        raise ValueError(
            f"training_rate={training_rate} leaves no normal rows to fit the "
            "scalers on (need at least 1)"
        )
    train_indices = np.arange(n_train)

    if scalers is not None:
        scaler_x, scaler_y = scalers
        if np.asarray(scaler_x.scale).shape[0] != x_combined.shape[1]:
            raise ValueError(
                f"injected scaler_x covers "
                f"{np.asarray(scaler_x.scale).shape[0]} features, data has "
                f"{x_combined.shape[1]}"
            )
    else:
        # Scalers fit ONLY on the normal training subset (01:271-274).
        scaler_x = AffineScaler.fit(x_normal[train_indices])
        scaler_y = AffineScaler.fit(y_normal[train_indices])

    # cast on the host: a float64 numpy input to jnp.asarray(..., f32) would
    # dispatch an eager convert_element_type on device — seconds per call
    # through a remote-compile relay; an f32 numpy array is a pure transfer
    x_scaled = np.asarray(scaler_x.transform(x_combined), np.float32)
    y_scaled = np.asarray(scaler_y.transform(y_combined), np.float32)

    info = DataInfo(
        boundary_lines=boundary_lines,
        segment_labels=labels,
        normal_samples=len(x_normal),
        fault_samples=len(x_combined) - len(x_normal),
        train_indices=train_indices,
        noise_info=noise_info,
    )
    return FuelCellDataset(
        x_train=jnp.asarray(x_scaled[train_indices]),
        y_train=jnp.asarray(y_scaled[train_indices]),
        x_test=jnp.asarray(x_scaled),
        y_test=jnp.asarray(y_scaled),
        scaler_x=scaler_x,
        scaler_y=scaler_y,
        info=info,
    )
