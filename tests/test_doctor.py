"""Tests for the deployment self-check (utils/doctor.py, `cli doctor`).

The reference has no operational tooling; these tests pin OUR contract:
every check is bounded, never initializes a JAX backend in the calling
process, and degrades to a readable FAIL instead of raising/hanging.
"""

import json
import os

import jax
import numpy as np
import pytest

from pinnfc_tpu.utils import doctor


class TestFilesystemChecks:
    def test_versions_and_environment_always_ok(self):
        v = doctor.check_versions()
        assert v["ok"] and "jax" in v["versions"]
        e = doctor.check_environment()
        assert e["ok"]
        # The pool IPs themselves must never leak into the report.
        assert e["env"].get("PALLAS_AXON_POOL_IPS") in (None, "<set>")

    def test_compilation_cache_disabled_via_empty_override(self, monkeypatch):
        monkeypatch.setenv("PINNFC_COMPILATION_CACHE_DIR", "")
        c = doctor.check_compilation_cache()
        assert c["ok"] and c["enabled"] is False

    def test_compilation_cache_writable_dir(self, monkeypatch, tmp_path):
        monkeypatch.setenv("PINNFC_COMPILATION_CACHE_DIR", str(tmp_path / "cc"))
        c = doctor.check_compilation_cache()
        assert c["ok"] and c["enabled"] and c["entries"] == 0

    def test_compilation_cache_unwritable_dir_fails(self, monkeypatch, tmp_path):
        blocked = tmp_path / "ro"
        blocked.write_text("a file, not a dir")  # makedirs will fail
        monkeypatch.setenv("PINNFC_COMPILATION_CACHE_DIR", str(blocked))
        c = doctor.check_compilation_cache()
        assert not c["ok"] and "not writable" in c["detail"]


class TestBoundedSubprocess:
    def test_probe_backend_cpu(self):
        res = doctor.probe_backend(timeout=120.0, platform="cpu")
        assert res["ok"], res["detail"]
        assert res["platform"] == "cpu"
        assert res["init_s"] >= 0 and res["first_op_s"] >= 0

    def test_probe_timeout_reports_stall(self):
        res = doctor._bounded_python("import time; time.sleep(60)", timeout=1.0)
        assert not res["ok"] and "timed out" in res["error"]

    def test_probe_nonzero_exit_reports_tail(self):
        res = doctor._bounded_python("raise SystemExit('boom')", timeout=30.0)
        assert not res["ok"] and "boom" in res["error"]

    def test_probe_missing_marker(self):
        res = doctor._bounded_python("print('hello')", timeout=30.0)
        assert not res["ok"] and "no doctor marker" in res["error"]


class TestArtifactAndCheckpoint:
    def test_check_checkpoint(self, tmp_path):
        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.utils import save_checkpoint

        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        rng = np.random.RandomState(0)
        sx = AffineScaler.fit(rng.uniform(1, 2, (32, 8)))
        sy = AffineScaler.fit(rng.uniform(1, 2, (32, 1)))
        ck = str(tmp_path / "ck")
        save_checkpoint(ck, params, sx, sy, meta={"seed": 7})

        res = doctor.check_checkpoint(ck)
        assert res["ok"], res["detail"]
        assert res["total_parameters"] > 0
        assert "scaler_x+scaler_y" in res["detail"]
        assert res["meta"]["seed"] == 7

    def test_check_checkpoint_missing_path_fails_readably(self, tmp_path):
        res = doctor.check_checkpoint(str(tmp_path / "nope"))
        assert not res["ok"] and "nope" in res["detail"]

    def test_check_artifact(self, tmp_path):
        from pinnfc_tpu.data.scaling import AffineScaler
        from pinnfc_tpu.models.pinn import init_pinn
        from pinnfc_tpu.serving import export_scorer

        params = init_pinn(jax.random.PRNGKey(0), (8, 16, 1))
        rng = np.random.RandomState(0)
        sx = AffineScaler.fit(rng.uniform(1, 2, (32, 8)))
        sy = AffineScaler.fit(rng.uniform(1, 2, (32, 1)))
        blob = export_scorer(params, sx, sy, platforms=("cpu",))
        path = tmp_path / "m.shlo"
        path.write_bytes(blob)

        res = doctor.check_artifact(str(path))
        assert res["ok"], res["detail"]
        assert res["platforms"] == ["cpu"]

    def test_check_artifact_garbage_fails_readably(self, tmp_path):
        path = tmp_path / "junk.shlo"
        path.write_bytes(b"not an artifact")
        res = doctor.check_artifact(str(path))
        assert not res["ok"]


class TestCli:
    def test_cli_doctor_skip_probe_json(self, capsys):
        from pinnfc_tpu.cli import main

        rc = main(["doctor", "--skip-probe", "--json"])
        out = capsys.readouterr().out
        checks = json.loads(out)
        names = [c["name"] for c in checks]
        assert names == [
            "versions", "environment", "compilation_cache",
            "warmup_coverage",
        ]
        assert rc == 0

    def test_cli_doctor_fail_exit_code(self, capsys, tmp_path):
        from pinnfc_tpu.cli import main

        rc = main([
            "doctor", "--skip-probe",
            "--ckpt", str(tmp_path / "does_not_exist"),
        ])
        out = capsys.readouterr().out
        assert rc == 1 and "FAIL" in out

    def test_run_doctor_orders_light_to_heavy(self, tmp_path):
        checks = doctor.run_doctor(skip_probe=True)
        assert [c["name"] for c in checks] == [
            "versions", "environment", "compilation_cache",
            "warmup_coverage",
        ]
