"""HBM budget guard (VERDICT r4 item 8): the campaign-scale production
programs must fit one v5e chip (16 GB) with headroom.  XLA's buffer
assignment on the CPU sim uses the same logical buffer sizes as the TPU
lowering (layout padding differs by at most small constants), so a
program whose resident set approaches the budget here would OOM on chip
— this catches it in CI instead of at a user's first full-scale run."""

from __future__ import annotations

import pytest

from pinnfc_tpu.config import TrainConfig
from pinnfc_tpu.utils.memory import (
    V5E_HBM_BYTES,
    memory_report,
    production_memory_report,
)


@pytest.fixture(scope="module")
def reports():
    # full campaign scale: default schedule, 6000 normal + 12x800 fault
    # rows, mc_times=2000 — exactly what `cli train` (no --small) runs
    return production_memory_report(
        TrainConfig(), n_normal=6000, n_fault=800, fleet_streams=64
    )


def test_all_programs_reported(reports):
    names = [r["program"] for r in reports]
    assert any(n.startswith("dnn[") for n in names)
    assert any(n.startswith("mc_") for n in names)
    assert any(n.startswith("monitor_fleet[S64") for n in names)
    assert all("unavailable" not in r for r in reports), names


def test_campaign_scale_fits_one_v5e(reports):
    """No production program's resident set may exceed half the 16 GB
    budget (headroom for the framework reserve + concurrent buffers)."""
    for rep in reports:
        assert rep["resident_bytes"] < V5E_HBM_BYTES // 2, (
            rep["program"],
            f"{rep['resident_bytes'] / 2**30:.2f} GiB",
        )


def test_memory_report_fields():
    import jax
    import jax.numpy as jnp

    co = jax.jit(lambda a: (a @ a).sum()).lower(
        jax.ShapeDtypeStruct((128, 128), jnp.float32)
    ).compile()
    rep = memory_report(co)
    assert rep is not None
    assert rep["argument_bytes"] == 128 * 128 * 4
    assert rep["resident_bytes"] >= rep["argument_bytes"]
