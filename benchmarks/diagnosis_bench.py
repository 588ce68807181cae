"""Diagnosis-suite throughput: every on-device method vs its sklearn CPU
counterpart at campaign scale.

The reference runs scripts 02/03/05 on the exported campaign: six
classifiers/clusterers fitted on the diagnosis train split (~11.7k rows ×
4 residual features at the 15.6k-row campaign, TEST_SIZE 0.25) plus the
IsolationForest AUC baseline (02:571-611). Each fit here is timed warm
(compile cached, data varied between repeats, forced readback) on the real
chip against sklearn on this host with the reference's own hyperparameters
(GMM 20 components 03:548, LR/SVC pipelines 05:284-341, KMeans/Ward/
Spectral 05:346-512).

Run on TPU: ``python benchmarks/diagnosis_bench.py [--skip-sklearn]``
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_TRAIN = 11_700  # 0.75 × the 15.6k-row campaign (03:30 TEST_SIZE = 0.25)
N_FEATURES = 4  # pV,pT,pH,pO (03:29)
N_CLASSES = 4
N_COMPONENTS = 20  # 5 × classes (03:548)


def _data(seed: int):
    rs = np.random.RandomState(seed)
    centers = rs.randn(N_CLASSES, N_FEATURES) * 2.5
    y = rs.randint(0, N_CLASSES, N_TRAIN)
    x = (centers[y] + rs.randn(N_TRAIN, N_FEATURES)).astype(np.float32)
    return x, y.astype(np.int32)


def _timed(fn, n_repeats: int = 3) -> float:
    """Median of ``n_repeats`` runs; fn(seed) must force a readback."""
    fn(0)  # warmup/compile
    times = []
    for i in range(1, n_repeats + 1):
        t0 = time.perf_counter()
        fn(i)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def bench_device() -> dict:
    import jax
    import jax.numpy as jnp

    from pinnfc_tpu.diagnosis import (
        gmm_fit,
        isoforest_fit,
        isoforest_score,
        kmeans_fit,
        logreg_fit,
        spectral_fit,
        svm_fit,
        ward_fit,
    )

    out = {}

    def run(name, fn):
        out[name] = round(_timed(fn), 3)
        print(f"  device {name}: {out[name]} s", flush=True)

    run("gmm", lambda i: float(
        gmm_fit(jnp.asarray(_data(i)[0]), jax.random.key(i),
                n_components=N_COMPONENTS).means[0, 0]))
    run("logreg", lambda i: float(
        logreg_fit(*_data(i), n_classes=N_CLASSES, balanced=True).coef[0, 0]))
    run("svm", lambda i: float(
        svm_fit(*_data(i), n_classes=N_CLASSES, c_svm=0.05,
                balanced=True).coef[0, 0]))
    run("kmeans", lambda i: int(
        kmeans_fit(jnp.asarray(_data(i)[0]), jax.random.key(i),
                   n_clusters=N_CLASSES, n_init=10).assignments[0]))
    run("ward", lambda i: int(
        ward_fit(jnp.asarray(_data(i)[0]), N_CLASSES).assignments[0]))
    run("spectral", lambda i: int(
        spectral_fit(jnp.asarray(_data(i)[0]), jax.random.key(i),
                     n_clusters=N_CLASSES).assignments[0]))

    def iso(i):
        x, _ = _data(i)
        model = isoforest_fit(jnp.asarray(x), jax.random.key(i))
        return float(isoforest_score(model, jnp.asarray(x))[0])

    run("isoforest", iso)
    return out


def bench_sklearn() -> dict:
    from sklearn.cluster import AgglomerativeClustering, KMeans, SpectralClustering
    from sklearn.ensemble import IsolationForest
    from sklearn.linear_model import LogisticRegression
    from sklearn.mixture import GaussianMixture
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler
    from sklearn.svm import SVC

    out = {}

    def run(name, fn):
        out[name] = round(_timed(fn, n_repeats=1), 3)
        print(f"  sklearn {name}: {out[name]} s", flush=True)

    run("gmm", lambda i: GaussianMixture(
        n_components=N_COMPONENTS, covariance_type="full",
        random_state=i).fit(_data(i)[0]))
    run("logreg", lambda i: Pipeline([
        ("s", StandardScaler()),
        ("m", LogisticRegression(solver="lbfgs", max_iter=1000,
                                 class_weight="balanced")),
    ]).fit(*_data(i)))
    run("svm", lambda i: Pipeline([
        ("s", StandardScaler()),
        ("m", SVC(kernel="linear", C=0.05, class_weight="balanced")),
    ]).fit(*_data(i)))
    run("kmeans", lambda i: KMeans(
        n_clusters=N_CLASSES, n_init=10, random_state=i).fit(_data(i)[0]))
    run("ward", lambda i: AgglomerativeClustering(
        n_clusters=N_CLASSES, linkage="ward").fit(_data(i)[0]))
    run("spectral", lambda i: SpectralClustering(
        n_clusters=N_CLASSES, affinity="nearest_neighbors", n_neighbors=10,
        assign_labels="kmeans", random_state=i).fit(_data(i)[0]))

    def iso(i):
        x, _ = _data(i)
        IsolationForest(n_estimators=200, random_state=i).fit(x).score_samples(x)

    run("isoforest", iso)
    return out


def main():
    from pinnfc_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dev = bench_device()
    result = {"metric": "diagnosis_fit_seconds", "n_train": N_TRAIN,
              "device": dev}
    if "--skip-sklearn" not in sys.argv:
        sk = bench_sklearn()
        result["sklearn_cpu"] = sk
        result["speedup"] = {
            k: round(sk[k] / dev[k], 1) for k in dev if k in sk
        }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
