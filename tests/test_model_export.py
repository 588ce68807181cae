"""jax.export model artifacts (serving/exported.py + cli export-model).

The reference never persists its model (SURVEY §5; the scripts retrain
from scratch every run) — this surface is beyond-reference deployment
machinery, so the tests anchor against OUR in-process forward, not the
reference.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pinnfc_tpu.data.scaling import AffineScaler
from pinnfc_tpu.models.pinn import init_pinn
from pinnfc_tpu.serving import build_scorer_fn, export_scorer, load_scorer


@pytest.fixture(scope="module")
def scorer_setup():
    rs = np.random.RandomState(7)
    sx = AffineScaler.fit(rs.randn(200, 8).astype(np.float32))
    sy = AffineScaler.fit(rs.randn(200, 1).astype(np.float32))
    params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
    return params, sx, sy, rs


class TestScorerExport:
    def test_roundtrip_matches_inprocess_any_batch(self, scorer_setup):
        """Serialize → deserialize → call at several batch sizes (ONE
        symbolic-batch artifact, no retrace) matches the in-process scorer
        to fusion-level rounding."""
        params, sx, sy, rs = scorer_setup
        blob = export_scorer(params, sx, sy, platforms=("cpu",))
        scorer = load_scorer(blob)
        ref = jax.jit(build_scorer_fn(params, sx, sy))
        for b in (1, 5, 33):
            x = rs.randn(b, 8).astype(np.float32)
            v1, lv1 = scorer(x)
            v2, lv2 = ref(jnp.asarray(x))
            assert v1.shape == (b,) and lv1.shape == (b,)
            np.testing.assert_allclose(
                np.asarray(v1), np.asarray(v2), atol=1e-6, rtol=1e-6
            )
            np.testing.assert_allclose(
                np.asarray(lv1), np.asarray(lv2), atol=1e-6, rtol=1e-6
            )

    def test_multi_platform_lowering(self, scorer_setup):
        """One artifact carries BOTH cpu and tpu lowerings (jax.export
        cross-lowers without the hardware present)."""
        from jax import export as jexport

        params, sx, sy, _ = scorer_setup
        blob = export_scorer(params, sx, sy, platforms=("cpu", "tpu"))
        exp = jexport.deserialize(blob)
        assert set(exp.platforms) == {"cpu", "tpu"}

    def test_scaler_baking(self, scorer_setup):
        """The artifact consumes RAW sensor units: feeding it the already
        normalized rows must NOT match — proof the scalers are inside."""
        params, sx, sy, rs = scorer_setup
        scorer = load_scorer(export_scorer(params, sx, sy, platforms=("cpu",)))
        x_raw = rs.randn(16, 8).astype(np.float32) * 10 + 3
        v_raw, _ = scorer(x_raw)
        v_norm_in, _ = scorer(np.asarray(sx.transform(x_raw)))
        assert not np.allclose(np.asarray(v_raw), np.asarray(v_norm_in))


class TestExportModelCli:
    def test_cli_export_and_load(self, tmp_path, scorer_setup):
        """cli export-model: checkpoint → artifact + provenance sidecar;
        the artifact reloads with only jax and matches the checkpoint's
        forward."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, rs = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy, meta={"seed": 7})
        out = str(tmp_path / "scorer.shlo")
        assert main(["export-model", "--ckpt", ckpt, "--out", out,
                     "--platforms", "cpu"]) == 0
        assert os.path.exists(out)

        sidecar = json.load(open(out + ".meta.json"))
        assert sidecar["kind"] == "pinnfc_scorer_stablehlo"
        assert sidecar["platforms"] == ["cpu"]
        assert sidecar["checkpoint_meta"]["seed"] == 7

        scorer = load_scorer(open(out, "rb").read())
        x = rs.randn(9, 8).astype(np.float32)
        v, _ = scorer(x)
        ref_v, _ = build_scorer_fn(params, sx, sy)(jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(v), np.asarray(ref_v), atol=1e-6, rtol=1e-6
        )

    def test_cli_rejects_empty_platforms(self, tmp_path, scorer_setup):
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.utils import save_checkpoint

        params, sx, sy, _ = scorer_setup
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, sx, sy)
        assert main(["export-model", "--ckpt", ckpt,
                     "--out", str(tmp_path / "o"), "--platforms", " ,"]) == 2
