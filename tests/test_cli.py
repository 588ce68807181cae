"""CLI surface tests: argument parsing and the downstream subcommands over a
prebuilt .mat artifact (the train path is covered by test_pipeline + verify)."""

import numpy as np
import pytest

from pinnfc_tpu.cli import main
from pinnfc_tpu.data.contract import INDEX, save_comprehensive_results


@pytest.fixture(scope="module")
def fake_mat(tmp_path_factory):
    """Small synthetic comprehensive_results with learnable structure."""
    rng = np.random.RandomState(0)
    n_normal, n_fault = 300, 60
    n = n_normal + 12 * n_fault
    arr = np.zeros((n, 22))
    arr[:, INDEX["y_true"]] = 4.0 + 0.02 * rng.randn(n)
    arr[:, INDEX["y_pred"]] = arr[:, INDEX["y_true"]] + 0.01 * rng.randn(n)
    arr[:, INDEX["ale"]] = 0.01 + 0.001 * rng.rand(n)
    arr[:, INDEX["epi"]] = 0.01 + 0.001 * rng.rand(n)
    arr[:, INDEX["res"]] = arr[:, INDEX["y_true"]] - arr[:, INDEX["y_pred"]]
    for k in ("pV", "pT", "pH", "pO"):
        arr[:, INDEX[k]] = 0.05 * rng.randn(n)
    arr[: n_normal, INDEX["x0"]] = rng.uniform(100, 400, n_normal)
    pos, label = n_normal, 1
    for fault in range(4):
        for amps in (108.0, 270.0, 405.0):
            seg = slice(pos, pos + n_fault)
            arr[seg, INDEX["label"]] = label
            arr[seg, INDEX["x0"]] = amps
            ramp = np.linspace(0, 2.0, n_fault)
            arr[seg, INDEX["res"]] += ramp
            arr[seg, INDEX["epi"]] += ramp * 0.02
            # distinct residual signature per fault class for the classifiers
            arr[seg, INDEX[("pV", "pT", "pH", "pO")[fault]]] += ramp
            arr[seg, INDEX["y_true"]] -= np.linspace(0, 0.25, n_fault)
            pos += n_fault
            label += 1
    path = str(tmp_path_factory.mktemp("cli") / "F01.mat")
    save_comprehensive_results(arr, path)
    return path


class TestCliSubcommands:
    def test_list_features(self, capsys):
        assert main(["auc", "--list-features"]) == 0
        assert "y_pred" in capsys.readouterr().out

    def test_auc(self, fake_mat, capsys):
        assert main(["auc", "--mat", fake_mat]) == 0
        out = capsys.readouterr().out
        assert "AUC=" in out and "IsolationForest" in out

    def test_gmm(self, fake_mat, capsys):
        assert main(["gmm", "--mat", fake_mat]) == 0
        assert "accuracy" in capsys.readouterr().out

    def test_risk(self, fake_mat, capsys):
        assert main(["risk", "--mat", fake_mat]) == 0
        out = capsys.readouterr().out
        assert "advance" in out

    def test_compare_subset(self, fake_mat, capsys):
        assert main(["compare", "--mat", fake_mat, "--methods", "logreg,kmeans"]) == 0
        out = capsys.readouterr().out
        assert "Supervised_LR" in out and "KMeans" in out

    def test_unknown_command_exits(self):
        with pytest.raises(SystemExit):
            main(["frobnicate"])
