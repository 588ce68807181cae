"""Linear recurrences as TPU scans.

The reference's only sequential computations are first-order linear
recurrences evaluated in Python loops:

- the RF(t) leaky risk integral ``C[t] = λ·C[t-1] + S[t]`` (04:262-264);
- the EMA smoother ``y[t] = α·x[t] + (1-α)·y[t-1]`` (04:276-279).

Both have the form ``y[t] = a[t]·y[t-1] + b[t]`` and so admit either a
``lax.scan`` (O(N) sequential, one kernel) or a ``lax.associative_scan``
(O(log N) depth — the TPU-friendly formulation for long sequences, composing
pairs ``(a, b) ∘ (a', b') = (a·a', a'·b + b')``).  Both are exposed; they are
bit-for-bit equivalent in exact arithmetic and agree to float tolerance.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def linear_recurrence_scan(a, b, y0=0.0):
    """Sequential ``y[t] = a[t]·y[t-1] + b[t]`` with ``y[-1] = y0``."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)

    def step(carry, ab):
        at, bt = ab
        y = at * carry + bt
        return y, y

    _, ys = jax.lax.scan(step, jnp.asarray(y0, dtype=b.dtype), (a, b))
    return ys

def linear_recurrence_assoc(a, b, y0=0.0):
    """Parallel-prefix formulation of the same recurrence (O(log N) depth)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    b = b.at[0].add(a[0] * jnp.asarray(y0, dtype=b.dtype))

    def combine(left, right):
        a_l, b_l = left
        a_r, b_r = right
        return a_l * a_r, a_r * b_l + b_r

    _, ys = jax.lax.associative_scan(combine, (a, b))
    return ys


def leaky_integral(s, decay: float, c0: float = 0.0, assoc: bool = True):
    """RF(t) accumulator ``C[t] = decay·C[t-1] + S[t]`` (04:262-264)."""
    s = jnp.asarray(s)
    a = jnp.full_like(s, decay)
    fn = linear_recurrence_assoc if assoc else linear_recurrence_scan
    return fn(a, s, c0)


def ema(x, alpha: float, assoc: bool = True):
    """Exponential moving average seeded with x[0] (04:276-279):
    ``y[0] = x[0]; y[t] = α·x[t] + (1-α)·y[t-1]``."""
    x = jnp.asarray(x)
    a = jnp.full_like(x, 1.0 - alpha)
    b = alpha * x
    # seed: y[0] = x[0]  →  treat y[-1]=x[0] with a[0]·y[-1]+b[0] = (1-α)x0+αx0 = x0
    fn = linear_recurrence_assoc if assoc else linear_recurrence_scan
    return fn(a, b, x[0])
