"""Real-campaign ingestion: .mat files on disk → full pipeline (VERDICT #2).

Writes 13 synthetic .mat files in the documented on-disk layout
(reference 01:2055-2135: Polar-1.mat channel variables + 12 fault
``segment_double`` matrices) and drives the pipeline purely from file paths.
"""

import os
import warnings

import numpy as np
import pytest

from pinnfc_tpu.data import (
    CampaignConfig,
    combine_and_normalize,
    default_fault_paths,
    load_campaign,
    load_campaign_dataset,
    synthesize_stack_data,
    write_campaign_mats,
)


@pytest.fixture(scope="module")
def campaign_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("campaign"))
    normal, faults = synthesize_stack_data(n_normal=400, n_fault=60, seed=7)
    cfg = write_campaign_mats(d, normal, faults, ascii_names=True)
    return d, cfg, (normal, faults)


class TestCampaignLoading:
    def test_roundtrip_matches_in_memory_arrays(self, campaign_dir):
        d, cfg, (normal, faults) = campaign_dir
        loaded_normal, loaded_faults = load_campaign(cfg)
        # loaders re-apply the reference row filters; the synthetic data is
        # generated inside the filter windows, so the roundtrip is lossless
        np.testing.assert_allclose(loaded_normal[0], normal[0], rtol=1e-12)
        np.testing.assert_allclose(loaded_normal[1], normal[1], rtol=1e-12)
        assert len(loaded_faults) == 12
        for (x_l, y_l, lab_l), (x_o, y_o, _) in zip(loaded_faults, faults):
            np.testing.assert_allclose(x_l, x_o, rtol=1e-12)
            np.testing.assert_allclose(y_l, y_o, rtol=1e-12)
        # labels in reference order: 水淹, 氧饥饿, 膜干, 氢饥饿 × 108/270/405 A
        assert loaded_faults[0][2] == "水淹故障(108A)"
        assert loaded_faults[11][2] == "氢饥饿故障(405A)"

    def test_ascii_fallback_paths(self, campaign_dir):
        d, _, _ = campaign_dir
        paths = default_fault_paths(d)
        assert len(paths) == 12
        # files were written with ASCII stems → fallback paths must resolve
        assert all(os.path.exists(p) for p, _ in paths)
        assert paths[0][0].endswith("water_flooding_108A.mat")

    def test_missing_file_skipped_with_warning(self, campaign_dir, tmp_path):
        d, cfg, _ = campaign_dir
        # point one fault at a nonexistent path (reference prints-and-continues)
        broken = cfg.fault_paths[:11] + (
            (str(tmp_path / "nope.mat"), "氢饥饿故障(405A)"),
        )
        cfg2 = CampaignConfig(cfg.normal_path, broken)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            _, faults = load_campaign(cfg2)
        assert len(faults) == 11
        assert any("missing" in str(x.message) for x in w)

        with pytest.raises(FileNotFoundError):
            load_campaign(CampaignConfig(cfg.normal_path, broken, skip_missing=False))

    def test_dataset_equals_in_memory_combine(self, campaign_dir):
        d, cfg, (normal, faults) = campaign_dir
        ds_file = load_campaign_dataset(cfg)
        ds_mem = combine_and_normalize(normal, faults, training_rate=1.0, seed=42)
        np.testing.assert_allclose(
            np.asarray(ds_file.x_test), np.asarray(ds_mem.x_test), rtol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ds_file.y_train), np.asarray(ds_mem.y_train), rtol=1e-6
        )
        assert ds_file.info.boundary_lines == ds_mem.info.boundary_lines
        assert ds_file.info.segment_labels == ds_mem.info.segment_labels


class TestCampaignEndToEnd:
    def test_cli_train_then_downstream_from_files(self, campaign_dir, tmp_path):
        """cli train --normal-mat/--fault-dir → F01_output.mat → every
        downstream stage, purely from file paths (VERDICT done-criterion)."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data import load_comprehensive_results

        d, cfg, _ = campaign_dir
        mat_out = str(tmp_path / "F01_output.mat")
        plot_dir = str(tmp_path / "figs")
        rc = main(
            [
                "train",
                "--normal-mat", cfg.normal_path,
                "--fault-dir", d,
                "--small", "--steps-scale", "0.05",
                "--mat-out", mat_out,
                "--plot-dir", plot_dir,
            ]
        )
        assert rc == 0
        # script-01 figure inventory: 2 uncertainty figures + detailed +
        # split + the main's inline true-vs-physics temperature figure
        # (01:2208-2228)
        assert {
            "uncertainty_aleatoric.png",
            "uncertainty_epistemic.png",
            "detailed.png",
            "split.png",
            "temp_comparison.png",
        } <= set(os.listdir(plot_dir))
        assert os.path.exists(mat_out)
        res = load_comprehensive_results(mat_out)
        assert res.array.shape[1] == 22
        # 400 normal + 12×60 fault rows
        assert res.array.shape[0] == 400 + 12 * 60
        labels = res.array[:, -5]  # col 17 = fault label
        assert set(np.unique(labels)) == set(float(i) for i in range(13))

        for sub in (["auc"], ["gmm"], ["risk"], ["compare", "--methods", "logreg"]):
            assert main(sub + ["--mat", mat_out]) == 0
