"""Compiled-program memory footprint observability (VERDICT r4 item 8).

Every scale claim so far was throughput-only; this module makes the HBM
side visible: XLA's post-buffer-assignment statistics
(``Compiled.memory_analysis()``) for the exact production programs —
training stages at campaign row counts, the MC exporter, the serving
monitor step and the S-stream fleet step — so "fits one v5e (16 GB)" is
a checked property, not an assumption discovered by the first OOM.

The program set is shared with ``utils.warmup`` (the same
``production_lowerings``), so the footprint report and the cache warmer
can never drift apart.  ``benchmarks/memory_bench.py`` prints the
campaign-scale table (PERFORMANCE.md records the on-chip numbers);
``tests/test_memory_footprint.py`` guards the 16 GB budget at full
campaign scale on every run of the suite.
"""

from __future__ import annotations

from typing import Dict, List, Optional

V5E_HBM_BYTES = 16 * 2**30  # one v5e chip


def memory_report(compiled) -> Optional[Dict]:
    """XLA buffer statistics for one compiled program (None when the
    backend provides no analysis).  ``peak_bytes`` is the scheduler's
    live-set peak where available; ``resident_bytes`` adds the
    argument/output buffers that must co-exist with it on device."""
    ma = compiled.memory_analysis()
    if ma is None:
        return None
    try:
        arg = int(ma.argument_size_in_bytes)
        out = int(ma.output_size_in_bytes)
        temp = int(ma.temp_size_in_bytes)
        alias = int(ma.alias_size_in_bytes)
        peak = int(getattr(ma, "peak_memory_in_bytes", 0) or 0)
        code = int(ma.generated_code_size_in_bytes)
    except Exception:
        return None
    # arguments and outputs live in HBM alongside the temp working set;
    # aliased buffers are counted once
    resident = arg + out + temp + code - alias
    return {
        "argument_bytes": arg,
        "output_bytes": out,
        "temp_bytes": temp,
        "alias_bytes": alias,
        "generated_code_bytes": code,
        "peak_bytes": peak,
        "resident_bytes": max(resident, peak),
    }


def fleet_step_lowering(params, scaler_x, scaler_y, n_streams: int = 64,
                        block: int = 64):
    """Lower the OnlineMonitor fleet step (observe_many's vmapped program)
    for an S-stream bank — the serving-capacity program whose footprint
    bounds how many streams one chip carries."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pinnfc_tpu.config import RiskConfig
    from pinnfc_tpu.serving import OnlineMonitor

    monitor = OnlineMonitor(
        params, scaler_x, scaler_y,
        mu=np.zeros(5, np.float32), sigma=np.ones(5, np.float32),
        config=RiskConfig(),
    )
    state = monitor._fresh_state()
    bank = jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct((n_streams,) + tuple(np.shape(a)),
                                       jnp.asarray(a).dtype),
        state,
    )
    vstep = jax.jit(
        jax.vmap(monitor._step_fn, in_axes=(None, 0, 0, 0, None, None))
    )
    xb = jax.ShapeDtypeStruct((n_streams, block, 8), jnp.float32)
    vb = jax.ShapeDtypeStruct((n_streams, block), jnp.float32)
    return vstep.lower(monitor.params, bank, xb, vb, monitor.mu, monitor.sigma)


def production_memory_report(
    config,
    n_normal: int = 6000,
    n_fault: int = 800,
    campaign=None,
    fleet_streams: Optional[int] = 64,
    block: int = 64,
) -> List[Dict]:
    """Compile the production program set at the given campaign scale and
    return one memory record per program (compiles hit the persistent
    cache when warm — run `cli warmup` first on a relay-attached TPU)."""
    import jax

    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.utils.warmup import _dataset_for, production_lowerings

    dataset = _dataset_for(config, n_normal, n_fault, campaign=campaign)
    progs = list(production_lowerings(config, dataset))
    if fleet_streams:
        params = init_pinn(
            jax.random.PRNGKey(config.seed), config.model.layers
        )
        progs.append((
            f"monitor_fleet[S{fleet_streams},b{block}]",
            lambda: fleet_step_lowering(
                params, dataset.scaler_x, dataset.scaler_y,
                n_streams=fleet_streams, block=block,
            ),
        ))
    out: List[Dict] = []
    for name, build in progs:
        rep = memory_report(build().compile())
        if rep is None:
            rep = {"unavailable": True}
        rep["program"] = name
        out.append(rep)
    return out
