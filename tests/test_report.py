"""Consolidated markdown run report (utils/report.py).

Beyond reference: the upstream scripts only print to stdout; the report
renders every downstream stage's findings into one document.  These tests
run all sections on a synthetic full-shape artifact and check the
degradation contract (a failing section becomes a note, never a crash).
"""

import os

import numpy as np
import pytest

from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results
from pinnfc_tpu.utils.report import ALL_SECTIONS, build_report, write_report


@pytest.fixture(scope="module")
def artifact():
    """22-col artifact exercising every section: 300 normal rows + 12 fault
    segments with distinct residual signatures, risk-condition currents,
    and positive uncertainty channels."""
    rng = np.random.RandomState(0)
    n_normal, n_fault = 300, 60
    n = n_normal + 12 * n_fault
    arr = np.zeros((n, 22))
    arr[:, INDEX["y_true"]] = 4.0 + 0.01 * rng.randn(n)
    arr[:, INDEX["y_pred"]] = arr[:, INDEX["y_true"]] + 0.02 * rng.randn(n)
    arr[:, INDEX["ale"]] = 0.05 + 0.01 * rng.rand(n)
    arr[:, INDEX["epi"]] = 0.02 + 0.01 * rng.rand(n)
    for k in ("res", "pV", "pT", "pH", "pO"):
        arr[:, INDEX[k]] = 0.05 * rng.randn(n)
    arr[:n_normal, INDEX["x0"]] = rng.uniform(100, 400, n_normal)
    pos, label = n_normal, 1
    for fault in range(4):
        for amps in (108.0, 270.0, 405.0):
            seg = slice(pos, pos + n_fault)
            arr[seg, INDEX["label"]] = label
            arr[seg, INDEX["x0"]] = amps
            # one dominant physics-layer signature per fault family plus a
            # voltage drop so the risk stage sees alarms
            arr[seg, INDEX[("pV", "pT", "pH", "pO")[fault]]] += rng.uniform(
                0.8, 1.2, n_fault
            )
            ramp = np.linspace(0, 3.0, n_fault)
            arr[seg, INDEX["res"]] += ramp * 0.5
            arr[seg, INDEX["y_true"]] = 4.0 - np.linspace(0, 0.3, n_fault)
            pos += n_fault
            label += 1
    return arr


class TestBuildReport:
    def test_all_sections_render(self, artifact):
        doc = build_report(artifact, mat_path="F01.mat")
        assert doc.startswith("# pinnfc_tpu run report")
        for title in (
            "Artifact overview", "Supervised detection", "Unsupervised GMM",
            "RF(t) early warning", "Method comparison",
            "Conformal calibration audit", "Figures",
        ):
            assert title in doc, title
        # every analytic section must actually succeed on this artifact
        assert "section unavailable" not in doc
        assert "| group | features | AUC | accuracy |" in doc
        assert "driver" in doc  # risk layer attribution column

    def test_sections_subset_and_unknown(self, artifact):
        doc = build_report(artifact, sections=["overview", "risk"])
        assert "Artifact overview" in doc and "RF(t) early warning" in doc
        assert "Method comparison" not in doc
        with pytest.raises(ValueError, match="unknown report sections"):
            build_report(artifact, sections=["overview", "nope"])

    def test_broken_section_degrades_to_note(self, artifact):
        """An artifact no stage can digest must still produce a report."""
        broken = np.zeros((3, 22))
        doc = build_report(broken)
        assert doc.startswith("# pinnfc_tpu run report")
        assert "section unavailable" in doc

    def test_figures_gallery_relative_links(self, artifact, tmp_path):
        figs = tmp_path / "figures"
        figs.mkdir()
        (figs / "roc.png").write_bytes(b"")
        (figs / "notes.txt").write_text("not a figure")
        out = write_report(
            str(tmp_path / "report.md"), artifact,
            figures_dir=str(figs), sections=["overview", "figures"],
        )
        text = open(out).read()
        assert "[roc](figures/roc.png)" in text
        assert "notes.txt" not in text

    def test_provenance_without_ckpt(self, artifact):
        doc = build_report(artifact, sections=["provenance"])
        assert "provenance omitted" in doc

    def test_section_registry_complete(self):
        from pinnfc_tpu.utils.report import _SECTION_FNS, _SECTION_TITLES

        assert set(ALL_SECTIONS) == set(_SECTION_TITLES)
        # figures and baseline are special-cased in the render loop
        assert set(ALL_SECTIONS) - {"figures", "baseline"} == set(_SECTION_FNS)


class TestModelLevelSections:
    """The identifiability/saliency sections need the checkpoint (params +
    scalers); with one they render the cli identify/explain tables, without
    one they degrade to a note (never a traceback)."""

    def test_render_with_checkpoint(self, artifact, tiny_dataset, tmp_path):
        import jax

        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.utils import save_checkpoint

        d = tiny_dataset
        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        ckpt = str(tmp_path / "ck")
        save_checkpoint(ckpt, params, d.scaler_x, d.scaler_y)
        doc = build_report(
            artifact, ckpt_path=ckpt,
            sections=["identifiability", "saliency"],
        )
        assert "section unavailable" not in doc
        assert "Physics-parameter identifiability" in doc
        assert "**lam_v**" in doc and "sensitivity" in doc
        assert "Input-channel saliency" in doc
        assert "voltage head" in doc and "aleatoric-σ head" in doc
        # every coarse class present in the artifact gets a saliency row
        assert "| normal |" in doc

    def test_degrade_without_checkpoint(self, artifact):
        doc = build_report(
            artifact, sections=["identifiability", "saliency"]
        )
        assert doc.count("model-level section omitted") == 2
        assert "section unavailable" not in doc


class TestBaselineDiff:
    def test_identical_artifacts_no_regression(self, artifact):
        doc = build_report(
            artifact, sections=["baseline"], baseline=artifact,
            baseline_path="base.mat",
        )
        assert "Regression vs baseline" in doc
        assert "No material regressions" in doc
        assert "`base.mat`" in doc

    def test_degraded_artifact_flags_regression(self, artifact):
        worse = artifact.copy()
        worse[:, INDEX["res"]] *= 3.0  # triples the voltage error
        doc = build_report(worse, sections=["baseline"], baseline=artifact)
        assert "⚠ regressed" in doc
        assert "material regression" in doc

    def test_default_report_omits_empty_baseline(self, artifact):
        doc = build_report(artifact, sections=["overview"])
        assert "Regression vs baseline" not in doc
        doc = build_report(artifact)
        assert "Regression vs baseline" not in doc

    def test_artifact_metrics_keys(self, artifact):
        from pinnfc_tpu.utils.report import artifact_metrics

        m = artifact_metrics(artifact)
        for k in ("rows", "voltage_mae", "voltage_rmse", "gmm_accuracy",
                  "auc_group1", "mean_rf_advance", "conformal_detection_auc"):
            assert k in m, k
        assert m["rows"] == len(artifact)
        assert np.isfinite(m["voltage_mae"])


class TestReportCli:
    def test_cmd_report(self, artifact, tmp_path, capsys):
        from pinnfc_tpu.cli import main

        mat = str(tmp_path / "F01_output.mat")
        save_comprehensive_results(artifact, mat)
        assert main(["report", "--mat", mat]) == 0
        out_path = str(tmp_path / "report.md")
        assert os.path.exists(out_path)
        assert "report →" in capsys.readouterr().out
        text = open(out_path).read()
        assert "RF(t) early warning" in text
        assert f"artifact: `{mat}`" in text

    def test_cmd_report_json(self, artifact, tmp_path, capsys):
        """--json prints the strict-JSON regression vector (NaN → null)."""
        import json

        from pinnfc_tpu.cli import main

        mat = str(tmp_path / "F01_output.mat")
        save_comprehensive_results(artifact, mat)
        assert main(["report", "--mat", mat, "--json"]) == 0
        metrics = json.loads(capsys.readouterr().out)
        assert metrics["rows"] == len(artifact)
        assert 0.0 <= metrics["gmm_accuracy"] <= 1.0
        # no report written in json mode
        assert not os.path.exists(str(tmp_path / "report.md"))

    def test_cmd_report_json_out(self, artifact, tmp_path, capsys):
        """--json-out writes the vector to a file alongside the markdown
        report (run-all's metrics.json)."""
        import json

        from pinnfc_tpu.cli import main

        mat = str(tmp_path / "F01_output.mat")
        save_comprehensive_results(artifact, mat)
        jpath = str(tmp_path / "metrics.json")
        assert main(["report", "--mat", mat, "--json-out", jpath,
                     "--sections", "overview"]) == 0
        with open(jpath) as f:
            metrics = json.load(f)
        assert metrics["rows"] == len(artifact)
        # markdown report still written
        assert os.path.exists(str(tmp_path / "report.md"))
