"""On-device exact t-SNE parity vs sklearn (02:63 TSNE_PARAMS, 03:451-460):
conditional/joint P matrices, KL+gradient, the gains/momentum optimizer
step-for-step, PCA init, and end-to-end embedding quality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from sklearn.manifold import TSNE, trustworthiness
from sklearn.manifold import _t_sne
from sklearn.manifold import _utils as _sk_utils
from sklearn.metrics import adjusted_rand_score, pairwise_distances

from pinnfc_tpu.diagnosis.tsne import (
    TsneResult,
    conditional_p,
    descent_phase,
    joint_p,
    kl_and_grad,
    pca_init,
    tsne_fit,
)
from pinnfc_tpu.viz import tsne_embed


def _is_tpu():
    return jax.default_backend() == "tpu"


# Tight-tolerance sklearn-parity anchors (2e-5/5e-5 trajectories, 2e-9 init)
# are meaningful on the CPU math unit; each t-SNE variant is also a separate
# multi-minute remote compile on the axon chip.  Hardware coverage comes from
# benchmarks/tsne_bench.py (runs tsne_fit at 14k rows on the real chip) and
# the one smoke test below that stays on.
CPU_ONLY = pytest.mark.skipif(
    _is_tpu(), reason="CPU-only sklearn-parity anchor (sub-1e-4 tolerance)"
)


def _blobs(n=120, d=5, k=3, seed=0, spread=0.6):
    rs = np.random.RandomState(seed)
    centers = rs.randn(k, d) * 4.0
    y = np.repeat(np.arange(k), n // k)
    x = centers[y] + spread * rs.randn(len(y), d)
    return x.astype(np.float32), y


@pytest.fixture(scope="module")
def blob_data():
    return _blobs()


@CPU_ONLY
class TestPMatrices:
    def test_conditional_p_matches_sklearn(self, blob_data):
        x, _ = blob_data
        d2 = pairwise_distances(x.astype(np.float64), squared=True)
        perplexity = 25.0
        ours = np.asarray(conditional_p(jnp.asarray(d2), jnp.float32(perplexity)))
        theirs = _sk_utils._binary_search_perplexity(
            d2.astype(np.float32), perplexity, 0
        )
        np.testing.assert_allclose(ours, theirs, atol=2e-5)
        # every row's perplexity is calibrated
        ent = -np.sum(np.where(ours > 0, ours * np.log(ours + 1e-30), 0.0), axis=1)
        np.testing.assert_allclose(np.exp(ent), perplexity, rtol=1e-3)

    def test_joint_p_matches_sklearn(self, blob_data):
        from scipy.spatial.distance import squareform

        x, _ = blob_data
        d2 = pairwise_distances(x.astype(np.float64), squared=True)
        ours = np.asarray(joint_p(conditional_p(jnp.asarray(d2), jnp.float32(30.0))))
        theirs = squareform(_t_sne._joint_probabilities(d2, 30.0, 0))
        mask = ~np.eye(len(x), dtype=bool)
        np.testing.assert_allclose(ours[mask], theirs[mask], atol=2e-7)


@CPU_ONLY
class TestOptimizer:
    def test_kl_and_grad_match_sklearn(self, blob_data):
        from scipy.spatial.distance import squareform

        x, _ = blob_data
        n = len(x)
        d2 = pairwise_distances(x.astype(np.float64), squared=True)
        p_cond = _t_sne._joint_probabilities(d2, 30.0, 0)  # condensed
        p_sq = jnp.asarray(np.maximum(squareform(p_cond), np.finfo(np.float64).eps))
        rs = np.random.RandomState(3)
        y = (rs.randn(n, 2) * 1e-2).astype(np.float32)

        kl, grad = kl_and_grad(jnp.asarray(y), p_sq)
        kl_sk, grad_sk = _t_sne._kl_divergence(
            y.ravel().astype(np.float64), p_cond, 1, n, 2
        )
        np.testing.assert_allclose(float(kl), kl_sk, rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(grad), grad_sk.reshape(n, 2), atol=1e-6
        )

    def test_descent_phase_matches_sklearn_gradient_descent(self, blob_data):
        """Step-for-step trajectory parity of the gains/momentum update rule
        over 12 iterations against sklearn's _gradient_descent."""
        from scipy.spatial.distance import squareform

        x, _ = blob_data
        n = len(x)
        d2 = pairwise_distances(x.astype(np.float64), squared=True)
        p_cond = _t_sne._joint_probabilities(d2, 30.0, 0)
        p_sq = jnp.asarray(np.maximum(squareform(p_cond), np.finfo(np.float64).eps))
        rs = np.random.RandomState(7)
        y0 = (rs.randn(n, 2) * 1e-4).astype(np.float32)
        lr = 100.0

        y, _, _, _ = descent_phase(
            jnp.asarray(y0), jnp.zeros((n, 2), jnp.float32),
            jnp.ones((n, 2), jnp.float32), p_sq, 0.5, lr, 12,
        )
        p_out, _, _ = _t_sne._gradient_descent(
            _t_sne._kl_divergence,
            y0.ravel().astype(np.float64),
            it=0, max_iter=12, n_iter_check=1,
            momentum=0.5, learning_rate=lr, min_grad_norm=0.0,
            args=[p_cond, 1, n, 2],
        )
        np.testing.assert_allclose(
            np.asarray(y), p_out.reshape(n, 2), atol=5e-5
        )


@CPU_ONLY
class TestInit:
    def test_pca_init_matches_sklearn(self, blob_data):
        from sklearn.decomposition import PCA

        x, _ = blob_data
        emb_sk = PCA(n_components=2, svd_solver="full").fit_transform(
            x.astype(np.float64)
        ).astype(np.float32)
        emb_sk = emb_sk / np.std(emb_sk[:, 0]) * 1e-4
        ours = np.asarray(pca_init(jnp.asarray(x), 2))
        # svd sign conventions can differ per column; compare up to sign
        for j in range(2):
            col, ref = ours[:, j], emb_sk[:, j]
            if np.dot(col, ref) < 0:
                col = -col
            np.testing.assert_allclose(col, ref, atol=2e-9)


class TestEndToEnd:
    @CPU_ONLY
    def test_embedding_quality_vs_sklearn(self, blob_data):
        x, y = blob_data
        ours = tsne_fit(x, perplexity=25.0, max_iter=500)
        assert isinstance(ours, TsneResult)
        emb = np.asarray(ours.embedding)
        assert emb.shape == (len(x), 2)
        assert np.isfinite(emb).all()
        assert float(ours.kl_divergence) >= 0.0

        sk = TSNE(n_components=2, perplexity=25.0, init="pca",
                  learning_rate="auto", random_state=42,
                  max_iter=500).fit_transform(x.astype(np.float64))
        t_ours = trustworthiness(x, emb)
        t_sk = trustworthiness(x, sk)
        assert t_ours >= t_sk - 0.03

    @CPU_ONLY
    def test_clusters_separate(self, blob_data):
        x, y = blob_data
        emb = np.asarray(tsne_fit(x, perplexity=20.0, max_iter=400).embedding)
        km = kmeans_labels(emb, 3)
        assert adjusted_rand_score(y, km) >= 0.9

    def test_random_init_and_perplexity_clamp(self):
        x, _ = _blobs(n=24, d=4, k=2, seed=1)
        out = tsne_fit(x, jax.random.key(0), perplexity=30.0,  # > (n-1)/3
                       max_iter=260, init="random")
        assert np.isfinite(np.asarray(out.embedding)).all()
        with pytest.raises(ValueError):
            tsne_fit(x, init="bogus")

    @CPU_ONLY
    def test_viz_backend_dispatch(self, blob_data):
        x, _ = blob_data
        emb_dev = tsne_embed(x[:60], perplexity=12.0)
        assert emb_dev.shape == (60, 2)
        emb_sk = tsne_embed(x[:60], perplexity=12.0, backend="sklearn")
        assert emb_sk.shape == (60, 2)


def kmeans_labels(emb, k):
    from sklearn.cluster import KMeans

    return KMeans(n_clusters=k, n_init=10, random_state=0).fit_predict(emb)
