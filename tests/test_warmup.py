"""`cli warmup` / utils.warmup: the persistent-cache pre-compilation
surface (VERDICT r4 item 2).

The contract under test: warmup AOT-compiles the EXACT program set the
training/export path later runs — so after a warmup, a real training run
adds no new cache entries — and the manifest lets `cli doctor` report
coverage without initializing a backend."""

from __future__ import annotations

import json
import os

import jax
import pytest

from pinnfc_tpu.config import StageConfig, TrainConfig
from pinnfc_tpu.utils.warmup import (
    MANIFEST_NAME,
    _dataset_for,
    production_lowerings,
    warm_cache,
    warmup_coverage,
)

TINY = TrainConfig(
    schedule=(
        StageConfig("dnn", 5, lr=0.01),
        StageConfig("lambda_v", 4, lr=1e-3, dnn_para=False),
        StageConfig("lambda_v", 4, lr=1e-3, dnn_para=True),
        StageConfig("thermal", 3, lr=1.0),
        StageConfig("hydrogen", 3, lr=0.1),
        StageConfig("oxygen", 3, lr=0.01),
    ),
    mc_times=8,
)


@pytest.fixture
def cache_dir(tmp_path, monkeypatch):
    """A private enabled persistent cache (conftest disables the shared
    one under the CPU sim); jax config restored afterwards."""
    d = str(tmp_path / "cache")
    monkeypatch.setenv("PINNFC_COMPILATION_CACHE_DIR", d)
    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    # the module-level cache object stays bound to the first dir it
    # initialized with; re-point it at this test's dir (and detach after)
    from jax._src import compilation_cache as cc

    cc.reset_cache()
    yield d
    cc.reset_cache()
    jax.config.update("jax_compilation_cache_dir", prev_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", prev_min)


@pytest.fixture
def dataset():
    return _dataset_for(TINY, 150, 30)


def test_program_list_covers_the_schedule(dataset):
    names = [n for n, _ in production_lowerings(TINY, dataset)]
    assert any(n.startswith("dnn[5]") for n in names)
    assert any("lambda_v[4]@norm" in n for n in names)
    assert any("lambda_v[4]@res" in n for n in names)
    for grp in ("thermal[3]", "hydrogen[3]", "oxygen[3]"):
        assert any(n.startswith(grp) for n in names)
    assert "eval_forward" in names
    assert any(n.startswith("mc_") for n in names)
    assert "device_columns" in names and "printed_stats" in names
    # identical stages dedupe into one program
    twice = TrainConfig(
        schedule=(StageConfig("dnn", 5, lr=0.01),) * 2, mc_times=8
    )
    assert (
        len([n for n, _ in production_lowerings(twice, dataset)])
        == len(set(n for n, _ in production_lowerings(twice, dataset)))
    )


def test_warmup_writes_manifest_and_rewarm_hits(cache_dir, dataset):
    progs = production_lowerings(TINY, dataset)
    records = warm_cache(progs, verbose=False)
    assert len(records) == len(progs)
    assert all(r["key"] for r in records), "cache keys must be captured"
    for r in records:
        assert os.path.exists(os.path.join(cache_dir, r["key"] + "-cache"))
    manifest = json.load(open(os.path.join(cache_dir, MANIFEST_NAME)))
    from pinnfc_tpu.utils.warmup import NONPERSISTABLE_PREFIXES as _NP

    n_persistable = len(
        [r for r in records if not r["program"].startswith(_NP)]
    )
    assert len(manifest["programs"]) == n_persistable

    again = warm_cache(production_lowerings(TINY, dataset), verbose=False)
    # the Pallas MC program's Mosaic payload makes its key lowering-
    # nondeterministic (warmup.NONPERSISTABLE_PREFIXES) — it legitimately
    # recompiles; every other program must hit
    from pinnfc_tpu.utils.warmup import NONPERSISTABLE_PREFIXES

    persistable = [
        r for r in again
        if not r["program"].startswith(NONPERSISTABLE_PREFIXES)
    ]
    assert persistable and all(r["was_cached"] for r in persistable), again


def test_doctor_coverage_reports_and_flags_eviction(cache_dir, dataset):
    cov = warmup_coverage()
    assert cov["ok"] and "no warmup manifest" in cov["detail"]

    records = warm_cache(production_lowerings(TINY, dataset), verbose=False)
    cov = warmup_coverage()
    assert cov["ok"] and not cov["missing"]
    from pinnfc_tpu.utils.warmup import NONPERSISTABLE_PREFIXES as _NP

    n_man = len([r for r in records if not r["program"].startswith(_NP)])
    assert f"{n_man}/{n_man}" in cov["detail"]

    # evict one entry: coverage must flag exactly that program as stale
    # (but stay ok — stale cache is a performance condition, not a health
    # failure, so doctor's exit code cannot fail a functional box)
    victim = next(
        r for r in records if not r["program"].startswith(_NP)
    )
    os.remove(os.path.join(cache_dir, victim["key"] + "-cache"))
    cov = warmup_coverage()
    assert cov["ok"] and cov["stale"]
    assert "STALE" in cov["detail"]
    assert any(victim["program"] in m for m in cov["missing"])


def test_training_after_warmup_adds_no_entries(cache_dir, dataset):
    """The done-criterion from VERDICT r4: warmup's programs ARE the
    training path's programs — a real (tiny) schedule run afterwards
    compiles nothing new."""
    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.training.stages import run_schedule
    from pinnfc_tpu.utils.warmup import warm_eager_ops

    warm_cache(production_lowerings(TINY, dataset), verbose=False)
    warm_eager_ops(TINY)
    before = set(os.listdir(cache_dir))

    params = init_pinn(jax.random.PRNGKey(TINY.seed), TINY.model.layers)
    rng = jax.random.key(TINY.seed + 1, impl=TINY.model.rng_impl)
    train_key, _ = jax.random.split(rng)
    run_schedule(
        params, dataset.x_train, dataset.y_train,
        dataset.scaler_x, dataset.scaler_y,
        schedule=TINY.schedule, rng=train_key,
        dropout_p=TINY.model.dropout_p,
    )
    new = set(os.listdir(cache_dir)) - before
    assert not new, f"training compiled programs warmup missed: {new}"


def test_cli_warmup_json(cache_dir, tmp_path, capsys):
    from pinnfc_tpu.cli import main

    rc = main([
        "warmup", "--small", "--steps-scale", "0.01",
        "--n-normal", "150", "--n-fault", "30", "--json",
    ])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["programs"] and all(r["key"] for r in out["programs"])


def test_downstream_warmup_covers_the_pipelines(cache_dir):
    """`cli warmup --mat`: after warm_downstream, re-running the four
    downstream pipelines adds ZERO cache entries — executing the real
    pipelines as the warmup makes drift impossible by construction."""
    import numpy as np

    from pinnfc_tpu.data.contract import INDEX, ComprehensiveResults
    from pinnfc_tpu.diagnosis import (
        run_auc_pipeline,
        run_compare_pipeline,
        run_gmm_pipeline,
    )
    from pinnfc_tpu.risk import run_risk_pipeline
    from pinnfc_tpu.utils.warmup import warm_downstream, warmup_coverage

    # small synthetic artifact: normal rows + the 12 (current, fault)
    # conditions so every pipeline (incl. the risk table) has work
    rng = np.random.RandomState(0)
    rows = []
    for label, current in [(0, 108)] * 4 + [
        (f, c) for c in (108, 270, 405) for f in (1, 2, 3, 4)
    ]:
        n = 60
        seg = rng.normal(0, 1, (n, 22))
        seg[:, INDEX["label"]] = label
        seg[:, INDEX["x0"]] = current + rng.uniform(-0.2, 0.2, n)
        seg[:, INDEX["y_true"]] = 90 + rng.normal(0, 0.5, n)
        rows.append(seg)
    arr = ComprehensiveResults(np.vstack(rows))

    records = warm_downstream(arr, verbose=False)
    assert records and all(r["key"] for r in records)
    cov = warmup_coverage()
    assert any(p.endswith("risk:0") or ":risk:" in p for p in cov["present"])

    before = set(os.listdir(cache_dir))
    run_auc_pipeline(arr)
    run_gmm_pipeline(arr)
    run_risk_pipeline(arr)
    run_compare_pipeline(arr)
    new = set(os.listdir(cache_dir)) - before
    assert not new, f"downstream pipelines compiled programs warmup missed: {new}"
