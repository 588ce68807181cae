"""On-device MinMax affine scaling.

The reference uses ``sklearn.MinMaxScaler(feature_range=(-1, 1))`` fit ONLY on
the normal-operation training subset (01:271-274) and then round-trips every
physics-residual evaluation through CPU numpy ``inverse_transform``
(01:726-727, 01:542-543, 01:629-630, 01:781-782, 01:879-880) — the single
biggest performance defect of the reference.  Here the scaler is a frozen
affine transform captured as jnp arrays, so normalization and inversion are
fused into the jitted compute graph and never leave the device.

Semantics match sklearn exactly:
    x_norm = x * scale_ + min_
    scale_ = (hi - lo) / data_range          (zero ranges -> divisor 1)
    min_   = lo - data_min * scale_
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AffineScaler:
    """MinMax scaler as a pytree of affine constants."""

    scale: jax.Array  # (D,)
    min: jax.Array  # (D,)
    data_min: jax.Array  # (D,)
    data_max: jax.Array  # (D,)
    feature_range: tuple = dataclasses.field(
        default=(-1.0, 1.0), metadata=dict(static=True)
    )

    @classmethod
    def fit(cls, data, feature_range=(-1.0, 1.0)) -> "AffineScaler":
        """Fit on ``data`` (N, D).  Mirrors sklearn MinMaxScaler.fit, including
        the zero-range guard (sklearn's ``_handle_zeros_in_scale``).

        The statistics are computed in numpy (cheap, one-off, avoids device
        dispatch in the data layer) and stored as jnp constants so they fuse
        into jitted compute downstream."""
        data = np.asarray(data, dtype=np.float32)
        lo, hi = feature_range
        data_min = np.min(data, axis=0)
        data_max = np.max(data, axis=0)
        rng = data_max - data_min
        safe_rng = np.where(rng == 0.0, 1.0, rng)
        scale = (hi - lo) / safe_rng
        min_ = lo - data_min * scale
        return cls(
            scale=jnp.asarray(scale),
            min=jnp.asarray(min_),
            data_min=jnp.asarray(data_min),
            data_max=jnp.asarray(data_max),
            feature_range=(float(lo), float(hi)),
        )

    def transform(self, x):
        if isinstance(x, np.ndarray):  # numpy in → numpy out, no device round trip
            return x * np.asarray(self.scale) + np.asarray(self.min)
        return jnp.asarray(x) * self.scale + self.min

    def inverse(self, x_norm):
        if isinstance(x_norm, np.ndarray):
            return (x_norm - np.asarray(self.min)) / np.asarray(self.scale)
        return (jnp.asarray(x_norm) - self.min) / self.scale

    # --- affine constants used by the lambda_v stage loss (01:1016-1032) ---
    def loss_affine(self):
        """Return (scale_y, min_y) with the reference's +1e-12 denominator
        guard (01:1021-1022), used to map physical-domain voltage back to the
        normalized domain inside the stage-2 physics loss."""
        lo, hi = self.feature_range
        scale_y = (hi - lo) / (self.data_max - self.data_min + 1e-12)
        min_y = lo - self.data_min * scale_y
        return scale_y, min_y

    def to_numpy(self):
        return {
            "scale": np.asarray(self.scale),
            "min": np.asarray(self.min),
            "data_min": np.asarray(self.data_min),
            "data_max": np.asarray(self.data_max),
            "feature_range": np.asarray(self.feature_range),
        }

    @classmethod
    def from_numpy(cls, d) -> "AffineScaler":
        fr = tuple(float(v) for v in np.asarray(d["feature_range"]).ravel())
        return cls(
            scale=jnp.asarray(d["scale"]).ravel(),
            min=jnp.asarray(d["min"]).ravel(),
            data_min=jnp.asarray(d["data_min"]).ravel(),
            data_max=jnp.asarray(d["data_max"]).ravel(),
            feature_range=fr,
        )
