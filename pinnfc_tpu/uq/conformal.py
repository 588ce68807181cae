"""Split-conformal prediction intervals and calibrated anomaly p-values.

The reference quantifies predictive uncertainty with MC dropout
(01_train_pinn_multiphysics_model.py:1413-1491) and draws ±2σ bands, but
those bands inherit whatever miscalibration the network has — nothing
guarantees that "±2σ" covers 95% of anything.  Split conformal prediction
(Vovk et al. 2005; Lei et al. 2018) wraps the SAME exported artifact
columns with a distribution-free, finite-sample guarantee:

* calibrate the score quantile ``q̂`` on held-out NORMAL rows;
* then for any fresh sample exchangeable with the calibration set, the
  interval ``v̂ ± q̂·σ̂`` covers the measured voltage with probability
  ≥ 1 − α — regardless of how wrong the network or its σ̂ is.

On FAULT rows the exchangeability premise deliberately breaks, and the
measured miscoverage — together with the per-sample conformal p-value
``p_i = (1 + #{calib scores ≥ s_i}) / (n_calib + 1)``, which is uniform
on normal data and collapses toward 1/(n+1) under shift — becomes a
*calibrated* anomaly signal.  That closes a gap in the reference's
explainability story: script 02's AUCs rank faults with raw residual
features whose scale means nothing to an operator, while ``1 − p`` is a
probability with a guarantee attached.

Scores:

* ``'adaptive'`` — ``s = |res| / σ̂`` with ``σ̂ = sqrt(ale² + epi²)``
  (locally adaptive intervals, width tracks the model's own uncertainty;
  uses the artifact's smoothed ale/epi columns, 01:1516-1529);
* ``'absolute'`` — ``s = |res|`` (constant width; the score the streaming
  monitor can evaluate online, where MC sampling is unavailable).

Everything here is exact f64 host numpy, like ``risk/rf.py``'s bit-exact
``lfilter`` backend and for the same reason: quantiles and p-values are
RANK statistics — a one-ulp f32 difference at a tie flips an integer
rank — and at artifact scale (~15k rows) the whole computation is
microseconds, far below any TPU dispatch.  The hot streaming evaluation
(a searchsorted against the baked calibration vector) lives in the
monitor's jitted step (serving/monitor.py), not here.

Caveat documented rather than hidden: the artifact's normal rows include
the reference's training rows (its test ⊇ train quirk, 01:300-316 —
preserved, see PARITY.md), so the guarantee is *within-artifact*
exchangeability; coverage on genuinely fresh normal campaigns may dip by
the train-fit optimism.  The calibration/evaluation split inside the
normal class keeps the reported normal coverage itself honest.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List

import numpy as np

from pinnfc_tpu.data.contract import INDEX


def conformal_quantile(scores: np.ndarray, alpha: float) -> float:
    """Finite-sample conformal quantile of ``scores``.

    The ``k = ⌈(n+1)(1−α)⌉``-th smallest score; ``inf`` when k > n
    (too few calibration points for the requested level — the interval
    honestly degenerates to the whole line instead of undercovering).
    """
    s = np.asarray(scores, np.float64).ravel()
    n = s.size
    if not 0.0 < alpha < 1.0:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if n == 0:
        return float("inf")
    k = math.ceil((n + 1) * (1.0 - alpha))
    if k > n:
        return float("inf")
    return float(np.sort(s)[k - 1])


def conformal_pvalues(calib_scores: np.ndarray, scores: np.ndarray) -> np.ndarray:
    """Per-sample conformal p-values against a calibration score set.

    ``p_i = (1 + #{calib ≥ s_i}) / (n_calib + 1)`` — exact rank counts
    (ties count as ≥, the conservative convention), uniform-distributed
    for exchangeable samples.  Non-finite scores (glitched rows) map to
    NaN, mirroring the serving glitch semantics.
    """
    calib = np.sort(np.asarray(calib_scores, np.float64).ravel())
    s = np.asarray(scores, np.float64)
    n = calib.size
    # #{calib >= s} = n − (first index where calib >= s) with 'left'
    ge = n - np.searchsorted(calib, s, side="left")
    p = (1.0 + ge) / (n + 1.0)
    return np.where(np.isfinite(s), p, np.nan)


@dataclasses.dataclass
class ClassCoverage:
    """Coverage of the conformal interval over one label's rows."""

    label: int  # 0 = normal (evaluation half), 1..12 = fault segment
    n: int  # rows in the class (including glitched / non-finite-score rows)
    # fraction of FINITE-score rows with |res| ≤ q̂·σ̂ — glitched rows are
    # excluded from the denominator here (they are a sensor problem, not a
    # coverage one); the report-level ``covered`` array keeps them False
    # for the per-row view.  NaN when every row glitched.
    coverage: float
    mean_width: float  # mean 2·q̂·σ̂ [V] over finite rows
    median_p: float  # median conformal p-value (glitches excluded)
    # fraction of finite rows with p ≤ α — EXACTLY 1 − coverage, by the
    # duality covered ⟺ p > α (tie-inclusive: when α·(n_calib+1) is an
    # integer, the boundary sample has p == α and is uncovered)
    frac_low_p: float


@dataclasses.dataclass
class ConformalReport:
    alpha: float
    score: str  # 'adaptive' | 'absolute'
    q_hat: float
    n_calib: int
    n_dropped: int  # non-finite-score rows excluded from calibration
    classes: List[ClassCoverage]
    detection_auc: float  # 1−p as normal-vs-fault score (eval normals vs faults)
    pvalues: np.ndarray  # (N,) over ALL artifact rows (NaN on glitches)
    covered: np.ndarray  # (N,) bool, interval covers y_true (False on glitches)
    calib_mask: np.ndarray  # (N,) bool, rows consumed for calibration
    calib_scores: np.ndarray  # the calibration score vector (for streaming reuse)

    @property
    def normal_eval(self) -> ClassCoverage:
        return next(c for c in self.classes if c.label == 0)

    def to_dict(self) -> Dict:
        return {
            "alpha": self.alpha,
            "score": self.score,
            "q_hat": self.q_hat,
            "n_calib": self.n_calib,
            "n_dropped": self.n_dropped,
            "detection_auc": self.detection_auc,
            "classes": [dataclasses.asdict(c) for c in self.classes],
        }


def artifact_scores(results: np.ndarray, score: str = "adaptive") -> tuple:
    """(scores, sigma) over every artifact row for ``score`` kind."""
    arr = np.asarray(results, np.float64)
    res = np.abs(arr[:, INDEX["res"]])
    if score == "adaptive":
        sigma = np.sqrt(arr[:, INDEX["ale"]] ** 2 + arr[:, INDEX["epi"]] ** 2)
        # a zero σ̂ row would make its score infinite and its interval
        # empty; floor at the smallest positive σ̂ seen (degenerate only
        # on synthetic data — smoothed MC stds are positive in practice)
        pos = sigma[sigma > 0]
        floor = float(pos.min()) if pos.size else 1.0
        sigma = np.maximum(sigma, floor)
    elif score == "absolute":
        sigma = np.ones_like(res)
    else:
        raise ValueError(f"score must be 'adaptive' or 'absolute', got {score!r}")
    return res / sigma, sigma


def normal_calibration_scores(
    results: np.ndarray,
    score: str = "absolute",
    calib_frac: float = 1.0,
    seed: int = 0,
) -> np.ndarray:
    """Finite scores of a seeded random ``calib_frac`` of the NORMAL rows —
    the calibration vector ``OnlineMonitor(conformal_calib=...)`` bakes."""
    arr = np.asarray(results, np.float64)
    scores, _ = artifact_scores(arr, score)
    normal = np.flatnonzero(arr[:, INDEX["label"]] == 0)
    if normal.size == 0:
        raise ValueError("artifact has no normal (label==0) rows to calibrate on")
    if not 0.0 < calib_frac <= 1.0:
        raise ValueError(f"calib_frac must be in (0, 1], got {calib_frac}")
    n_cal = max(1, int(round(normal.size * calib_frac)))
    picked = np.random.RandomState(seed).permutation(normal.size)[:n_cal]
    s = scores[normal[picked]]
    return s[np.isfinite(s)]


def conformal_report(
    results: np.ndarray,
    alpha: float = 0.1,
    score: str = "adaptive",
    calib_frac: float = 0.5,
    seed: int = 0,
) -> ConformalReport:
    """Split-conformal analysis of one exported artifact.

    Calibrates on a seeded random ``calib_frac`` of the normal rows,
    reports honest coverage on the held-out normal rows and the (expected,
    diagnostic) miscoverage on each fault segment, plus the normal-vs-
    fault detection AUC of the conformal anomaly score ``1 − p``.
    """
    arr = np.asarray(results, np.float64)
    labels = arr[:, INDEX["label"]].astype(np.int64)
    scores, sigma = artifact_scores(arr, score)

    normal = np.flatnonzero(labels == 0)
    if normal.size < 2:
        raise ValueError("need ≥2 normal rows to split calibration/evaluation")
    if not 0.0 < calib_frac < 1.0:
        raise ValueError(f"calib_frac must be in (0, 1), got {calib_frac}")
    perm = np.random.RandomState(seed).permutation(normal.size)
    n_cal = min(max(1, int(round(normal.size * calib_frac))), normal.size - 1)
    calib_mask = np.zeros(arr.shape[0], bool)
    calib_mask[normal[perm[:n_cal]]] = True

    calib_all = scores[calib_mask]
    finite = np.isfinite(calib_all)
    calib = calib_all[finite]
    n_dropped = int((~finite).sum())

    q_hat = conformal_quantile(calib, alpha)
    p = conformal_pvalues(calib, scores)
    covered = np.isfinite(scores) & (scores <= q_hat)

    classes: List[ClassCoverage] = []
    for lbl in np.unique(labels):
        rows = (labels == lbl) & ~calib_mask
        n = int(rows.sum())
        if n == 0:
            continue
        fin = rows & np.isfinite(scores)
        classes.append(ClassCoverage(
            label=int(lbl),
            n=n,
            coverage=float(covered[fin].mean()) if fin.any()
            else float("nan"),
            mean_width=float(2.0 * q_hat * sigma[fin].mean()) if fin.any()
            else float("nan"),
            median_p=float(np.nanmedian(p[rows])) if fin.any()
            else float("nan"),
            frac_low_p=float((p[fin] <= alpha).mean()) if fin.any()
            else float("nan"),
        ))

    eval_rows = ~calib_mask & np.isfinite(scores)
    is_fault = labels > 0
    det_auc = float("nan")
    if (eval_rows & is_fault).any() and (eval_rows & ~is_fault).any():
        from pinnfc_tpu.diagnosis.metrics import roc_auc_score

        det_auc = roc_auc_score(
            is_fault[eval_rows].astype(np.int64), 1.0 - p[eval_rows]
        )

    return ConformalReport(
        alpha=alpha, score=score, q_hat=q_hat, n_calib=int(calib.size),
        n_dropped=n_dropped, classes=classes, detection_auc=det_auc,
        pvalues=p, covered=covered, calib_mask=calib_mask, calib_scores=calib,
    )
