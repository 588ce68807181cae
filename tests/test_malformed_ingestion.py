"""Malformed-input robustness of the .mat ingestion layer (VERDICT r4
item 7): truncated files, wrong channel counts, missing keys, NaN-filled
campaigns must surface CLEAR errors naming the file — never a silent
misparse or a bare byte-level traceback.  The defensive counterpart of
the reference's own format checks (01:204-221, 02:112-113)."""

from __future__ import annotations

import os

import numpy as np
import pytest
import scipy.io

from pinnfc_tpu.data import load_comprehensive_results
from pinnfc_tpu.data.loaders import (
    FAULT_CORR_INDEX,
    NORMAL_X_KEYS,
    load_fault_mat,
    load_normal_mat,
)


def _write_normal(path, n=100, **overrides):
    rng = np.random.RandomState(0)
    data = {k: rng.uniform(0.5, 1.5, n) for k in NORMAL_X_KEYS}
    data["I"] = rng.uniform(100, 400, n)
    data["U"] = rng.uniform(80, 100, n)
    data.update(overrides)
    scipy.io.savemat(path, data)
    return path


def _write_fault(path, n=50, n_cols=70, **kw):
    rng = np.random.RandomState(1)
    seg = rng.uniform(0.5, 1.5, (n, n_cols))
    for k, v in kw.items():
        seg[:, int(k)] = v
    scipy.io.savemat(path, {"segment_double": seg})
    return path


class TestTruncatedFiles:
    def test_truncated_normal(self, tmp_path):
        p = _write_normal(str(tmp_path / "n.mat"))
        blob = open(p, "rb").read()
        trunc = str(tmp_path / "trunc.mat")
        open(trunc, "wb").write(blob[: len(blob) // 3])
        with pytest.raises(ValueError, match="trunc.mat"):
            load_normal_mat(trunc)

    def test_empty_and_header_truncations(self, tmp_path):
        """scipy raises MatReadError on 0-byte/header-truncated files and
        IndexError on short mid-header cuts — every one must come back as
        a ValueError naming the file (review finding, round 5)."""
        full = _write_normal(str(tmp_path / "src.mat"))
        blob = open(full, "rb").read()
        for n in (0, 8, 64, 100):
            p = str(tmp_path / f"cut{n}.mat")
            open(p, "wb").write(blob[:n])
            with pytest.raises(ValueError, match=f"cut{n}.mat"):
                load_normal_mat(p)

    def test_garbage_bytes_fault(self, tmp_path):
        p = str(tmp_path / "garbage.mat")
        open(p, "wb").write(b"\x00\x01not a mat file" * 10)
        with pytest.raises(ValueError, match="garbage.mat"):
            load_fault_mat(p)

    def test_truncated_artifact(self, tmp_path):
        p = str(tmp_path / "art.mat")
        scipy.io.savemat(p, {"comprehensive_results": np.zeros((10, 22))})
        blob = open(p, "rb").read()
        open(p, "wb").write(blob[: len(blob) // 2])
        with pytest.raises(ValueError, match="art.mat"):
            load_comprehensive_results(p)


class TestMissingKeys:
    def test_normal_missing_channels(self, tmp_path):
        p = str(tmp_path / "n.mat")
        _write_normal(p)
        data = scipy.io.loadmat(p)
        del data["m_H2"], data["U"]
        scipy.io.savemat(p, data)
        with pytest.raises(ValueError) as e:
            load_normal_mat(p)
        assert "m_H2" in str(e.value) and "U" in str(e.value)
        assert "n.mat" in str(e.value)

    def test_fault_missing_segment_double(self, tmp_path):
        p = str(tmp_path / "f.mat")
        scipy.io.savemat(p, {"wrong_name": np.zeros((10, 70))})
        with pytest.raises(ValueError, match="segment_double"):
            load_fault_mat(p)

    def test_artifact_missing_variable(self, tmp_path):
        p = str(tmp_path / "a.mat")
        scipy.io.savemat(p, {"something_else": np.zeros((10, 22))})
        with pytest.raises(KeyError, match="comprehensive_results"):
            load_comprehensive_results(p)


class TestWrongShapes:
    def test_normal_channel_length_mismatch(self, tmp_path):
        p = _write_normal(str(tmp_path / "n.mat"),
                          m_O2=np.ones(37))  # others have 100 rows
        with pytest.raises(ValueError) as e:
            load_normal_mat(p)
        assert "m_O2" in str(e.value) and "37" in str(e.value)

    def test_fault_too_few_columns(self, tmp_path):
        need = int(FAULT_CORR_INDEX.max()) + 1
        p = _write_fault(str(tmp_path / "f.mat"), n_cols=need - 10)
        with pytest.raises(ValueError) as e:
            load_fault_mat(p)
        assert str(need) in str(e.value)

    def test_fault_one_dimensional(self, tmp_path):
        p = str(tmp_path / "f.mat")
        scipy.io.savemat(p, {"segment_double": np.arange(5.0)})
        with pytest.raises(ValueError, match="segment_double"):
            load_fault_mat(p)

    def test_artifact_too_few_columns(self, tmp_path):
        p = str(tmp_path / "a.mat")
        scipy.io.savemat(p, {"comprehensive_results": np.zeros((10, 12))})
        with pytest.raises(ValueError, match="12"):
            load_comprehensive_results(p)


class TestNaNCampaigns:
    def test_normal_nan_current_rejected(self, tmp_path):
        """An all-NaN current channel must not silently yield an empty
        campaign (NaN fails the 50<I<800 filter row by row)."""
        p = _write_normal(str(tmp_path / "n.mat"),
                          I=np.full(100, np.nan))
        with pytest.raises(ValueError, match="50 < I < 800"):
            load_normal_mat(p)

    def test_fault_zero_coolant_rejected(self, tmp_path):
        p = _write_fault(str(tmp_path / "f.mat"),
                         **{str(FAULT_CORR_INDEX[1]): 0.0})
        with pytest.raises(ValueError, match="coolant"):
            load_fault_mat(p)

    def test_nan_values_survive_with_finite_current(self, tmp_path):
        """NaN in non-filter channels is NOT a loader error (the reference
        loads them; --skip-nonfinite and the serving glitch path handle
        them downstream) — but the rows must come through unmangled."""
        p = _write_normal(str(tmp_path / "n.mat"),
                          m_W=np.full(100, np.nan))
        x, y = load_normal_mat(p)
        assert x.shape == (100, 8) and np.isnan(x[:, 1]).all()
        assert np.isfinite(y).all()


class TestHappyPathUnchanged:
    def test_normal_roundtrip(self, tmp_path):
        p = _write_normal(str(tmp_path / "n.mat"))
        x, y = load_normal_mat(p)
        assert x.shape[1] == 8 and y.shape[1] == 1 and len(x) == len(y)

    def test_fault_roundtrip(self, tmp_path):
        p = _write_fault(str(tmp_path / "f.mat"))
        x, y = load_fault_mat(p)
        assert x.shape[1] == 8 and y.shape[1] == 1 and len(x) == 50
