"""Tests for pinnfc_tpu.ops: smoothing parity vs pandas, recurrences vs
Python-loop oracles (reference semantics 01:1830-1872, 04:262-279)."""

import numpy as np
import pytest

from pinnfc_tpu.ops import (
    centered_moving_average,
    ema,
    leaky_integral,
    linear_recurrence_assoc,
    linear_recurrence_scan,
    smooth_by_segments,
)


class TestCenteredMovingAverage:
    @pytest.mark.parametrize("window", [1, 3, 4, 7, 200, 1000])
    def test_pandas_parity(self, window, rng):
        import pandas as pd

        a = rng.randn(317)
        want = pd.Series(a).rolling(window=window, center=True, min_periods=1).mean().values
        got = centered_moving_average(a, window)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_jnp_path(self, rng):
        import jax.numpy as jnp
        import pandas as pd

        a = rng.randn(64).astype(np.float32)
        want = pd.Series(a).rolling(window=8, center=True, min_periods=1).mean().values
        got = np.asarray(centered_moving_average(jnp.asarray(a), 8))
        # f32 on device: window means near zero need an absolute tolerance
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_empty(self):
        out = centered_moving_average(np.array([]), 5)
        assert out.shape == (0,)


class TestSmoothBySegments:
    def test_no_cross_boundary_leak(self, rng):
        # two constant segments: smoothing must preserve each exactly
        vals = np.r_[np.ones(50), 5 * np.ones(50)]
        out = smooth_by_segments(vals, [50, 100], window=20)
        np.testing.assert_allclose(out[:50], 1.0)
        np.testing.assert_allclose(out[50:], 5.0)

    def test_reference_loop_oracle(self, rng):
        import pandas as pd

        vals = rng.randn(120)
        bounds = [40, 90, 120]
        got = smooth_by_segments(vals, bounds, window=15)
        starts = [0] + bounds[:-1]
        want = np.empty_like(vals)
        for s, e in zip(starts, bounds):
            want[s:e] = (
                pd.Series(vals[s:e]).rolling(15, center=True, min_periods=1).mean().values
            )
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_short_boundaries_fall_back_to_global(self, rng):
        # reference 01:1859-1862: boundaries not covering the array → global MA
        vals = rng.randn(30)
        got = smooth_by_segments(vals, [10], window=5)
        want = centered_moving_average(vals, 5)
        np.testing.assert_allclose(got, want, atol=1e-12)

    def test_overlong_boundaries_truncated(self, rng):
        vals = rng.randn(30)
        got = smooth_by_segments(vals, [10, 30, 45], window=5)
        want = smooth_by_segments(vals, [10, 30], window=5)
        np.testing.assert_allclose(got, want, atol=1e-12)


class TestRecurrences:
    def test_leaky_integral_matches_loop(self, rng):
        s = rng.rand(400).astype(np.float64)
        lam = 0.9971
        want = np.zeros(400)
        prev = 0.0
        for t in range(400):
            prev = lam * prev + s[t]
            want[t] = prev
        for assoc in (True, False):
            got = np.asarray(leaky_integral(s, lam, assoc=assoc))
            np.testing.assert_allclose(got, want, rtol=2e-4)

    def test_ema_matches_reference_loop(self, rng):
        x = rng.rand(300)
        alpha = 0.2
        want = np.zeros(300)
        want[0] = x[0]
        for t in range(1, 300):
            want[t] = alpha * x[t] + (1 - alpha) * want[t - 1]
        for assoc in (True, False):
            got = np.asarray(ema(x, alpha, assoc=assoc))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_assoc_equals_scan(self, rng):
        a = rng.rand(256).astype(np.float32) * 0.99
        b = rng.randn(256).astype(np.float32)
        y1 = np.asarray(linear_recurrence_scan(a, b, 0.3))
        y2 = np.asarray(linear_recurrence_assoc(a, b, 0.3))
        np.testing.assert_allclose(y1, y2, rtol=1e-4, atol=1e-5)


class TestSmoothingTailCoverage:
    def test_overlong_boundaries_never_return_garbage(self):
        """Boundaries past n used to leave the tail (or everything) as
        uninitialized memory after the out-of-range filter (review r3)."""
        from pinnfc_tpu.ops.smoothing import (
            centered_moving_average,
            smooth_by_segments,
        )

        v = np.ones(10)
        # tail [5:10) uncovered after 15 is dropped → must be smoothed
        out = smooth_by_segments(v, [5, 15], 3)
        np.testing.assert_allclose(out, np.ones(10))
        # every boundary dropped → whole-array smoothing
        out = smooth_by_segments(np.arange(10.0), [15], 4)
        np.testing.assert_allclose(
            out, centered_moving_average(np.arange(10.0), 4)
        )
