"""On-device t-SNE throughput at production scale.

The reference embeds the full test set with sklearn's TSNE (02:319 at
~14k rows; 03:451-460) — a CPU Barnes-Hut run. This measures
``diagnosis.tsne.tsne_fit`` (exact method, one jit, 1000 iterations) on the
real chip at the same scale, plus the sklearn baseline on this host for the
speedup line in PERFORMANCE.md.

Run on TPU: ``python benchmarks/tsne_bench.py [--skip-sklearn]``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_ROWS = 14_000  # ≈ test-set size of the 15.6k-row campaign (test_size 0.9)
N_FEATURES = 6  # script-03 feature-group width (epi/res/T-channels)
PERPLEXITY = 20.0  # 03:454
MAX_ITER = 1000


def _data(seed: int) -> np.ndarray:
    rs = np.random.RandomState(seed)
    centers = rs.randn(4, N_FEATURES) * 3.0
    y = rs.randint(0, 4, N_ROWS)
    return (centers[y] + 0.5 * rs.randn(N_ROWS, N_FEATURES)).astype(np.float32)


def bench_device() -> float:
    import jax

    from pinnfc_tpu.diagnosis.tsne import tsne_fit

    # warmup/compile (same shapes as the timed runs)
    out = tsne_fit(_data(0), perplexity=PERPLEXITY, max_iter=MAX_ITER)
    assert np.isfinite(np.asarray(out.embedding)).all()

    # different data per repeat (defeats relay memoization) + forced readback
    times = []
    for i in range(1, 4):
        x = _data(i)
        t0 = time.perf_counter()
        out = tsne_fit(x, perplexity=PERPLEXITY, max_iter=MAX_ITER)
        kl = float(out.kl_divergence)
        times.append(time.perf_counter() - t0)
        assert np.isfinite(kl)
    return sorted(times)[len(times) // 2]


def bench_sklearn() -> float:
    from sklearn.manifold import TSNE

    x = _data(1).astype(np.float64)
    t0 = time.perf_counter()
    TSNE(n_components=2, perplexity=PERPLEXITY, init="pca",
         learning_rate="auto", random_state=42,
         max_iter=MAX_ITER).fit_transform(x)
    return time.perf_counter() - t0


def main():
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = bench_device()
    out = {"metric": "tsne_14k_fit_seconds", "value": round(dev, 3),
           "unit": "s", "n_rows": N_ROWS, "max_iter": MAX_ITER}
    if "--skip-sklearn" not in sys.argv:
        sk = bench_sklearn()
        out["sklearn_cpu_seconds"] = round(sk, 3)
        out["speedup"] = round(sk / dev, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
