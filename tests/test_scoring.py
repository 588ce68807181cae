"""Offline scoring: checkpoint + new measurements → artifact, no retraining.

The reference cannot do this — script 01 always retrains before exporting
(01:2143-2187).  The contract under test: scoring normalizes the new data
through the CHECKPOINT's scalers (the model's own normalized space), and
scoring the training campaign with the training seed reproduces the
train-time export bit-for-bit.
"""

import dataclasses as dc

import numpy as np
import pytest

from pinnfc_tpu.config import StageConfig, TrainConfig
from pinnfc_tpu.data import load_comprehensive_results
from pinnfc_tpu.data.synthetic import synthesize_stack_data
from pinnfc_tpu.pipeline import run_scoring_pipeline, run_training_pipeline
from pinnfc_tpu.utils import save_checkpoint

N_NORMAL, N_FAULT = 500, 80


def _mini_config(seed=0):
    sched = (
        StageConfig("dnn", 150, lr=0.01),
        StageConfig("lambda_v", 40, lr=1e-3, dnn_para=False),
        StageConfig("thermal", 80, lr=1.0),
        StageConfig("hydrogen", 40, lr=0.1, lr_gamma=0.9),
        StageConfig("oxygen", 40, lr=0.01, lr_gamma=0.9),
    )
    return TrainConfig(schedule=sched, mc_times=40, seed=seed)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from pinnfc_tpu.config import train_config_to_dict

    cfg = _mini_config()
    res = run_training_pipeline(cfg, n_normal=N_NORMAL, n_fault=N_FAULT)
    ckpt = str(tmp_path_factory.mktemp("score") / "ckpt")
    save_checkpoint(
        ckpt, res.params, res.dataset.scaler_x, res.dataset.scaler_y,
        meta={"config": train_config_to_dict(cfg),
              "n_normal": N_NORMAL, "n_fault": N_FAULT},
    )
    return cfg, res, ckpt


class TestScoringPipeline:
    def test_training_campaign_scores_bit_exact(self, trained):
        """Same data source, same seed → the scored artifact IS the
        train-time export (stored scalers ≡ fit scalers; same MC key
        derivation)."""
        import warnings as w

        cfg, res, ckpt = trained
        with w.catch_warnings(record=True) as caught:
            w.simplefilter("always")
            scored = run_scoring_pipeline(
                ckpt, cfg, n_normal=N_NORMAL, n_fault=N_FAULT
            )
        assert np.array_equal(scored.results.array, res.results.array)
        # the model's own campaign shows zero drift and raises no warning
        assert scored.metrics["normal_oob_frac"] == 0.0
        assert not [c for c in caught if "drifted" in str(c.message)]

    def test_new_campaign_uses_checkpoint_scalers(self, trained):
        """A shifted campaign must NOT re-fit the scalers: the normalized
        space stays the checkpoint's, and the artifact's input columns
        round-trip the new raw measurements."""
        cfg, res, ckpt = trained
        cfg2 = dc.replace(cfg, seed=7)  # different synthetic campaign
        scored = run_scoring_pipeline(ckpt, cfg2, n_normal=300, n_fault=50)

        # scalers are the checkpoint's (fit on the TRAINING campaign) ...
        np.testing.assert_array_equal(
            np.asarray(scored.dataset.scaler_x.data_min),
            np.asarray(res.dataset.scaler_x.data_min),
        )
        # ... and deliberately NOT a re-fit on the new campaign's rows
        normal, faults = synthesize_stack_data(n_normal=300, n_fault=50, seed=7)
        new_fit_min = np.min(np.asarray(normal[0], np.float32), axis=0)
        assert not np.array_equal(
            np.asarray(scored.dataset.scaler_x.data_min), new_fit_min
        )

        # exported cols 0-7 de-normalize back to the raw new measurements
        raw = np.vstack([normal[0]] + [x for x, _, _ in faults])
        np.testing.assert_allclose(
            scored.results.array[:, 0:8], raw, rtol=2e-4, atol=1e-3
        )

    def test_scored_artifact_feeds_downstream(self, trained):
        """The scored artifact satisfies the 22-column contract the
        downstream stages consume."""
        cfg, _res, ckpt = trained
        cfg2 = dc.replace(cfg, seed=7)
        scored = run_scoring_pipeline(ckpt, cfg2, n_normal=300, n_fault=50)
        arr = scored.results.array
        assert arr.shape == (300 + 12 * 50, 22)
        assert np.isfinite(arr).all()
        # residual identity col 12 = col 8 − col 9 (01:1940)
        np.testing.assert_allclose(arr[:, 12], arr[:, 8] - arr[:, 9], atol=1e-9)

    def test_drift_check_warns_on_shifted_campaign(self, trained):
        """A campaign whose normal operating point moved beyond the
        checkpoint's training range raises the drift warning."""
        from pinnfc_tpu.data import combine_and_normalize

        cfg, res, ckpt = trained
        normal, faults = synthesize_stack_data(
            n_normal=300, n_fault=50, seed=7
        )
        shifted_normal = (np.asarray(normal[0]) * 1.5, normal[1])
        shifted_faults = [(np.asarray(x) * 1.5, y, nm) for x, y, nm in faults]
        ds = combine_and_normalize(
            shifted_normal, shifted_faults, seed=7,
            scalers=(res.dataset.scaler_x, res.dataset.scaler_y),
        )
        with pytest.warns(UserWarning, match="drifted"):
            scored = run_scoring_pipeline(ckpt, cfg, dataset=ds)
        assert scored.metrics["normal_oob_frac"] > 0.5

    def test_meta_config_adopted_when_none_given(self, trained):
        """config=None adopts the checkpoint's stored training config
        ("score like you trained"): with no settings restated, scoring the
        training campaign still reproduces the train-time export
        bit-for-bit."""
        _cfg, res, ckpt = trained
        scored = run_scoring_pipeline(ckpt, n_normal=N_NORMAL, n_fault=N_FAULT)
        assert np.array_equal(scored.results.array, res.results.array)

    def test_checkpoint_without_scalers_rejected(self, trained, tmp_path):
        cfg, res, _ = trained
        bare = str(tmp_path / "bare_ckpt")
        save_checkpoint(bare, res.params)  # no scalers
        with pytest.raises(ValueError, match="no scalers"):
            run_scoring_pipeline(bare, cfg, n_normal=100, n_fault=20)


class TestScoringDataParallel:
    def test_score_mesh_matches_single_device(self, trained):
        """run_scoring_pipeline(mesh=) shards the MC export's rows over the
        mesh's 'data' axis; with deterministic MC (dropout=0) the scored
        artifact must equal the single-device one exactly (same padding/trim
        contract as TestShardedExport, reached through the scoring entry)."""
        import jax

        from pinnfc_tpu.parallel import make_mesh

        if jax.device_count() < 8:
            pytest.skip("needs 8 devices (CPU simulation run)")

        cfg, _res, ckpt = trained
        # 301 normal + 12*47 fault rows = 865, not divisible by 8 →
        # exercises the pad/trim path through the scoring wrapper
        cfg2 = dc.replace(cfg, seed=7, mc_dropout=0.0, mc_times=16)
        single = run_scoring_pipeline(ckpt, cfg2, n_normal=301, n_fault=47)
        assert single.results.array.shape[0] % 8 != 0
        dp = run_scoring_pipeline(
            ckpt, cfg2, n_normal=301, n_fault=47, mesh=make_mesh(8)
        )
        np.testing.assert_allclose(
            dp.results.array, single.results.array, rtol=1e-5, atol=1e-6
        )


class TestScoreCli:
    def test_cli_score_writes_artifact(self, trained, tmp_path, capsys):
        from pinnfc_tpu.cli import main

        import os

        cfg, _res, ckpt = trained
        out = str(tmp_path / "scored.mat")
        figs = str(tmp_path / "figs")
        rc = main([
            "score", "--ckpt", ckpt, "--mat-out", out, "--small",
            "--n-normal", "200", "--n-fault", "30", "--seed", "3",
            "--plot-dir", figs,
        ])
        assert rc == 0
        results = load_comprehensive_results(out)
        assert results.array.shape == (200 + 12 * 30, 22)
        assert "comprehensive_results" in capsys.readouterr().out
        # the script-01 figure set applies to scored artifacts too
        for f in ("uncertainty_aleatoric.png", "uncertainty_epistemic.png",
                  "detailed.png", "split.png", "temp_comparison.png"):
            assert os.path.exists(os.path.join(figs, f)), f

    def test_cli_score_defaults_from_meta(self, trained, tmp_path, capsys):
        """A completely bare `cli score --ckpt --mat-out` adopts the
        checkpoint's training config AND data sizes (mc_times=40, seed=0,
        500/80 here) and says so; the scored artifact is the bit-exact
        train-time export with zero flags restated."""
        from pinnfc_tpu.cli import main

        cfg, res, ckpt = trained
        out = str(tmp_path / "scored_meta.mat")
        rc = main(["score", "--ckpt", ckpt, "--mat-out", out])
        assert rc == 0
        stdout = capsys.readouterr().out
        assert f"mc_times={cfg.mc_times}" in stdout
        assert f"seed={cfg.seed}" in stdout
        results = load_comprehensive_results(out)
        assert np.array_equal(results.array, np.asarray(res.results.array))

    def test_cli_score_ignore_ckpt_config(self, trained, tmp_path, capsys):
        """--ignore-ckpt-config builds the config from CLI flags alone
        (mc_times=200 via --small instead of the checkpoint's 40)."""
        from pinnfc_tpu.cli import main

        _cfg, _res, ckpt = trained
        out = str(tmp_path / "scored_flags.mat")
        rc = main(["score", "--ckpt", ckpt, "--mat-out", out, "--small",
                   "--ignore-ckpt-config",
                   "--n-normal", "150", "--n-fault", "20"])
        assert rc == 0
        stdout = capsys.readouterr().out
        assert "config from checkpoint meta" not in stdout
        assert load_comprehensive_results(out).array.shape == (390, 22)

    def test_cli_score_campaign_with_meta_defaults(self, trained, tmp_path,
                                                   capsys):
        """Meta adoption with a REAL campaign and no --seed: args.seed is
        resolved from the checkpoint config before campaign loading (a None
        seed would make the combine nondeterministic), so two runs produce
        the identical artifact."""
        from pinnfc_tpu.cli import main
        from pinnfc_tpu.data.campaign import write_campaign_mats

        _cfg, _res, ckpt = trained
        normal, faults = synthesize_stack_data(n_normal=150, n_fault=20, seed=9)
        camp = write_campaign_mats(str(tmp_path / "camp"), normal, faults)

        arrays = []
        for i in range(2):
            out = str(tmp_path / f"scored_camp{i}.mat")
            rc = main(["score", "--ckpt", ckpt, "--mat-out", out,
                       "--normal-mat", camp.normal_path,
                       "--fault-dir", str(tmp_path / "camp")])
            assert rc == 0
            arrays.append(load_comprehensive_results(out).array)
        capsys.readouterr()
        np.testing.assert_array_equal(arrays[0], arrays[1])

    def test_cli_inspect_describes_checkpoint(self, trained, capsys):
        from pinnfc_tpu.cli import main

        cfg, _res, ckpt = trained
        rc = main(["inspect", "--ckpt", ckpt])
        assert rc == 0
        stdout = capsys.readouterr().out
        assert '"n_normal": 500' in stdout          # meta sidecar
        assert f'"mc_times": {cfg.mc_times}' in stdout
        assert "mlp/hidden/0/w" in stdout           # param tree
        assert "total:" in stdout
        assert "scaler_x: 8 features" in stdout     # stored ranges
        # the identified physics parameters, with physical names
        assert "lam_v[0]" in stdout
        assert "ohmic resistance" in stdout

    def test_cli_inspect_json(self, trained, capsys):
        """--json: machine-readable view, parseable and complete."""
        import json

        from pinnfc_tpu.cli import main

        cfg, _res, ckpt = trained
        rc = main(["inspect", "--ckpt", ckpt, "--json"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out)
        assert out["meta"]["config"]["mc_times"] == cfg.mc_times
        assert out["params"]["mlp/hidden/0/w"]["shape"] == [8, 256]
        assert out["total_parameters"] > 100_000
        assert len(out["lambdas"]["lam_t"]["values"]) == 5
        assert len(out["scalers"]["scaler_x"]["data_min"]) == 8

    def test_run_all_from_ckpt_skips_training(self, trained, tmp_path, capsys):
        """`run-all --from-ckpt` replaces the train stage with the score
        stage and still runs every downstream stage on the scored artifact
        (the reference has no retrain-free path)."""
        import os

        from pinnfc_tpu.cli import main

        _cfg, _res, ckpt = trained
        out = str(tmp_path / "runall")
        rc = main(["run-all", "--out-dir", out, "--small",
                   "--from-ckpt", ckpt])
        assert rc == 0
        stdout = capsys.readouterr().out
        assert "run-all complete" in stdout
        for token in ("AUC=", "accuracy", "advance", "Supervised_LR",
                      "streamed"):
            assert token in stdout, token
        # the serving stage announces WHICH model it loaded (meta sidecar)
        assert "checkpoint provenance:" in stdout
        assert os.path.exists(os.path.join(out, "F01_output.mat"))
        # no training happened: run-all wrote no fresh checkpoint
        assert not os.path.exists(os.path.join(out, "pinn_ckpt"))
        # ... but the score stage still emitted the script-01 figures
        assert os.path.exists(
            os.path.join(out, "figures", "temp_comparison.png")
        )
