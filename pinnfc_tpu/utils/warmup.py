"""Deliberate pre-population of the persistent compilation cache.

A fresh deployment pays the worst compile bill at the worst time: the
first `cli train` on a cold box remote-compiles every production program
through the relay (BENCH_r04 recorded 1112 s of compiles before the
first step; individual programs have cost 6-17+ min).  ``cli warmup``
moves that cost to a moment of the operator's choosing: it AOT-compiles
(``jit(...).lower(...).compile()``) the exact program set the training /
export / serving paths will run — same functions, same static arguments,
same shapes — WITHOUT executing any of them, so the persistent cache
(utils/compilation_cache.py) then serves every later run in seconds.

Programs covered (the `cli train`/`score`/`monitor` bill):

* every distinct staged-schedule program (``train_dnn_stage``,
  ``train_lambda_v_stage`` both ``dnn_para`` modes,
  ``train_residual_stage`` per λ group) at the configured schedule
  lengths — scan trip counts are static, so warming a different length
  would miss;
* ``_eval_forward`` (the λ-stage prediction constant);
* the MC exporter: the sampler program ``sampler='auto'`` would pick on
  this backend (Pallas kernel on TPU at the flagship topology, the
  vmapped sampler elsewhere) plus ``_device_columns``;
* the metrics program ``_printed_stats_device``;
* with ``--ckpt``: the serving surface for that checkpoint — the
  OnlineMonitor block step (the checkpoint's scalers are baked into the
  step as constants, so only the real checkpoint produces the real
  program) at the given block size.

The data-build programs (synthesize/combine — themselves jitted device
programs, see the round-2 eager-purge) are warmed as a side effect:
warmup executes the real data setup because the dataset row counts (and
therefore every stage program's shapes) are data-dependent.

Each compile records its persistent-cache key (captured by wrapping
``jax._src.compilation_cache.get_cache_key`` — the exact key the normal
execution path will look up) into a manifest in the cache directory, so
``cli doctor`` can report warm-cache coverage WITHOUT initializing a
backend or compiling anything: a cache entry is the file
``<key>-cache`` in the cache dir.

No reference equivalent: torch compiles eagerly per-op and has no
remote-compile cliff (SURVEY §5 ops tooling gap).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional

MANIFEST_NAME = "pinnfc_warmup_manifest.json"

# The Pallas MC kernel's Mosaic payload (the serialized MLIR inside its
# tpu_custom_call backend_config) embeds lowering-order-dependent bytes,
# so its cache key differs on EVERY lowering — measured on the v5e: two
# back-to-back lowerings of the identical call diverge only inside that
# opaque payload.  The program can therefore never hit the persistent
# cache; it recompiles per process (~1.5 s on a healthy relay — the
# kernel is tiny).  Such programs are still warmed/reported by
# `cli warmup` but excluded from the manifest, otherwise `cli doctor`
# would report the cache permanently stale on TPU hosts.
NONPERSISTABLE_PREFIXES = ("mc_pallas",)


def resolve_cache_dir() -> Optional[str]:
    """The persistent cache directory enable_compilation_cache would use
    (None when disabled via PINNFC_COMPILATION_CACHE_DIR='')."""
    override = os.environ.get("PINNFC_COMPILATION_CACHE_DIR")
    if override == "":
        return None
    return os.path.expanduser(override or "~/.cache/pinnfc_jax")


def _dataset_for(config, n_normal: int, n_fault: int, campaign=None):
    """The SAME data source resolution as run_training_pipeline (shapes
    are data-dependent, so warmup must build the real dataset)."""
    if campaign is not None:
        from pinnfc_tpu.data.campaign import load_campaign_dataset

        return load_campaign_dataset(campaign)
    from pinnfc_tpu.data.combine import combine_and_normalize
    from pinnfc_tpu.data.synthetic import synthesize_stack_data

    normal, faults = synthesize_stack_data(
        n_normal=n_normal, n_fault=n_fault, seed=config.seed
    )
    return combine_and_normalize(
        normal, faults, training_rate=config.training_rate, seed=config.seed
    )


def production_lowerings(
    config,
    dataset,
    ckpt_path: Optional[str] = None,
    block: int = 64,
) -> List:
    """(name, build) pairs where ``build()`` returns a ``jax.stages.Lowered``
    for one production program.  Building is lazy so a failed/interrupted
    warmup still compiles everything before the failure point."""
    import jax
    import jax.numpy as jnp

    from pinnfc_tpu.models.pinn import init_pinn
    from pinnfc_tpu.training import stages as st

    params = init_pinn(jax.random.PRNGKey(config.seed), config.model.layers)
    rng = jax.random.key(config.seed + 1, impl=config.model.rng_impl)
    train_key, mc_key = jax.random.split(rng)

    x_tr = jax.ShapeDtypeStruct(dataset.x_train.shape, jnp.float32)
    y_tr = jax.ShapeDtypeStruct(dataset.y_train.shape, jnp.float32)
    x_te = jax.ShapeDtypeStruct(dataset.x_test.shape, jnp.float32)
    y_te = jax.ShapeDtypeStruct(dataset.y_test.shape, jnp.float32)
    sx, sy = dataset.scaler_x, dataset.scaler_y
    u_pred = jax.ShapeDtypeStruct((dataset.x_train.shape[0], 1), jnp.float32)

    progs: List = []
    seen = set()

    def add(name, build):
        if name not in seen:
            seen.add(name)
            progs.append((name, build))

    group_of = {"thermal": "lam_t", "hydrogen": "lam_h", "oxygen": "lam_o"}
    needs_eval_forward = False
    for stage in config.schedule:
        if stage.name == "dnn":
            sig = (f"dnn[{stage.n_iter}]@lr{stage.lr:g}"
                   f"/s{stage.lr_step}/g{stage.lr_gamma:g}")
            add(sig, lambda s=stage: st.train_dnn_stage.lower(
                params["mlp"], x_tr, y_tr, train_key,
                n_iter=s.n_iter, lr=s.lr, lr_step=s.lr_step,
                lr_gamma=s.lr_gamma, dropout_p=config.model.dropout_p,
                precision=config.model.precision,
                skip_nonfinite=config.skip_nonfinite,
            ))
        elif stage.name == "lambda_v":
            needs_eval_forward = True
            sig = (f"lambda_v[{stage.n_iter}]"
                   f"@{'res' if stage.dnn_para else 'norm'}"
                   f"/lr{stage.lr:g}/s{stage.lr_step}/g{stage.lr_gamma:g}")
            add(sig, lambda s=stage: st.train_lambda_v_stage.lower(
                params["lam_v"], x_tr, y_tr, u_pred, sx, sy,
                n_iter=s.n_iter, lr=s.lr, lr_step=s.lr_step,
                lr_gamma=s.lr_gamma, dnn_para=s.dnn_para,
                skip_nonfinite=config.skip_nonfinite,
            ))
        elif stage.name in group_of:
            grp = group_of[stage.name]
            sig = (f"{stage.name}[{stage.n_iter}]"
                   f"@lr{stage.lr:g}/s{stage.lr_step}/g{stage.lr_gamma:g}")
            add(sig, lambda s=stage, g=grp: st.train_residual_stage.lower(
                params[g], x_tr, sx, g,
                n_iter=s.n_iter, lr=s.lr, lr_step=s.lr_step,
                lr_gamma=s.lr_gamma,
                skip_nonfinite=config.skip_nonfinite,
            ))
    if needs_eval_forward:
        add("eval_forward", lambda: st._eval_forward.lower(
            params["mlp"], x_tr
        ))

    # --- exporter: the sampler 'auto' would select on this backend ------
    from pinnfc_tpu.pipeline.export import _device_columns
    from pinnfc_tpu.uq.mc_dropout import MCSamples

    flagship = [w["w"].shape for w in params["mlp"]["hidden"]] == [
        (8, 256), (256, 256), (256, 256)
    ]
    if flagship and jax.default_backend() == "tpu":
        from pinnfc_tpu.ops.pallas_mc_dropout import mc_dropout_pallas

        add(f"mc_pallas[{config.mc_times}]", lambda: mc_dropout_pallas.lower(
            params["mlp"], x_te, 0, mc_times=config.mc_times,
            dropout=config.mc_dropout, interpret=False,
        ))
    else:
        from pinnfc_tpu.uq.mc_dropout import _CHUNK_ROW_BUDGET, _mc_dropout_jit

        # same chunk clamp as mc_dropout_samples (the chunk is static)
        n_rows = dataset.x_test.shape[0]
        chunk = max(1, min(100, config.mc_times,
                           _CHUNK_ROW_BUDGET // max(n_rows, 1)))
        add(f"mc_vmap[{config.mc_times}]", lambda: _mc_dropout_jit.lower(
            params["mlp"], x_te, mc_key, mc_times=config.mc_times,
            dropout=config.mc_dropout, chunk=chunk,
        ))
    n_te = dataset.x_test.shape[0]
    mc_struct = MCSamples(
        pred_mean=jax.ShapeDtypeStruct((n_te,), jnp.float32),
        aleatoric_std=jax.ShapeDtypeStruct((n_te,), jnp.float32),
        epistemic_std=jax.ShapeDtypeStruct((n_te,), jnp.float32),
    )
    add("device_columns", lambda: _device_columns.lower(
        params, x_te, y_te, sx, sy, mc_struct
    ))

    # --- metrics program the pipeline runs after export -----------------
    from pinnfc_tpu.pipeline.train_pipeline import _printed_stats_device

    add("printed_stats", lambda: _printed_stats_device.lower(
        params, x_te, sx, sy
    ))

    # --- serving surface (needs the real checkpoint: its scalers are
    #     baked into the step program as constants) ----------------------
    if ckpt_path:
        import numpy as np

        from pinnfc_tpu.config import RiskConfig
        from pinnfc_tpu.serving import OnlineMonitor

        def build_monitor_step():
            monitor = OnlineMonitor.from_checkpoint(
                ckpt_path,
                np.zeros(5, np.float32), np.ones(5, np.float32),
                RiskConfig(),
            )
            state = monitor._fresh_state()
            xb = jax.ShapeDtypeStruct((block, 8), jnp.float32)
            vb = jax.ShapeDtypeStruct((block,), jnp.float32)
            return monitor._step.lower(
                monitor.params, state, xb, vb, monitor.mu, monitor.sigma
            )

        add(f"monitor_step[b{block}]", build_monitor_step)
    return progs


def warm_cache(progs, verbose: bool = True) -> List[Dict]:
    """AOT-compile each (name, build) program, capturing its persistent
    cache key and whether the entry already existed.  Returns one record
    per program; writes/merges the manifest into the cache dir."""
    import jax
    from jax._src import compilation_cache as cc

    # persist EVERY program: the normal 1 s write threshold (see
    # compilation_cache.enable_compilation_cache) would silently skip the
    # small metric/eval programs on fast backends, and a "warmed" program
    # that was never written defeats the command's purpose
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    # the in-memory executable cache would short-circuit the persistent
    # lookup for programs this process already compiled — warmup's job is
    # the DISK cache, so start from a clean in-memory slate (fresh CLI
    # processes are unaffected; in-process callers get true hit reports)
    jax.clear_caches()

    cache_dir = resolve_cache_dir()
    records: List[Dict] = []
    orig = cc.get_cache_key
    captured: List = []

    def recording(*a, **k):
        key = orig(*a, **k)
        pre = (
            os.path.exists(os.path.join(cache_dir, key + "-cache"))
            if cache_dir else None
        )
        captured.append((key, pre))
        return key

    try:
        for name, build in progs:
            captured.clear()
            t0 = time.perf_counter()
            cc.get_cache_key = recording
            try:
                build().compile()
            finally:
                cc.get_cache_key = orig
            dt = time.perf_counter() - t0
            _record(records, name, captured, dt, verbose)
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        # a mid-run failure (the relay outage this tool exists to
        # mitigate) must still record every program that DID compile —
        # otherwise doctor reports "no warmup manifest" on a half-warm box
        _write_manifest(records)
    return records


def _record(records, name, captured, dt, verbose):
    # one compile may consult several key variants (e.g. PGLE); the
    # entry the next run looks up first is the first one computed
    key, pre_existing = captured[0] if captured else (None, None)
    rec = {
        "program": name,
        "key": key,
        "compile_s": round(dt, 2),
        "was_cached": bool(pre_existing) if key else None,
    }
    records.append(rec)
    if verbose:
        state = (
            "cache hit" if rec["was_cached"]
            else "compiled" if key else "compiled (key not captured)"
        )
        print(f"  {name:<42} {state:>10}  {dt:7.1f}s")


def warm_downstream(results, verbose: bool = True) -> List[Dict]:
    """Warm the downstream-diagnosis program set (AUC, GMM, risk table,
    six-method comparison) for a given artifact by EXECUTING the four
    pipelines once with the persistence threshold dropped.

    Unlike the 42k-step training schedule, the downstream pipelines cost
    seconds to run (1.8 s warm in-process, PERFORMANCE.md), so running
    them IS the cheapest correct warmup — and it can never drift from the
    real program set the way an AOT enumeration could.  Cache keys are
    captured per stage for the manifest (named ``downstream:<stage>:<i>``
    — the per-jit names are not visible at the key layer)."""
    import jax
    from jax._src import compilation_cache as cc

    from pinnfc_tpu.diagnosis import (
        run_auc_pipeline,
        run_compare_pipeline,
        run_gmm_pipeline,
    )
    from pinnfc_tpu.risk import run_risk_pipeline

    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.clear_caches()

    cache_dir = resolve_cache_dir()
    records: List[Dict] = []
    orig = cc.get_cache_key
    captured: List = []

    def recording(*a, **k):
        key = orig(*a, **k)
        pre = (
            os.path.exists(os.path.join(cache_dir, key + "-cache"))
            if cache_dir else None
        )
        captured.append((key, pre))
        return key

    stages = (
        ("auc", run_auc_pipeline),
        ("gmm", run_gmm_pipeline),
        ("risk", run_risk_pipeline),
        ("compare", run_compare_pipeline),
    )
    try:
        for stage, fn in stages:
            captured.clear()
            t0 = time.perf_counter()
            cc.get_cache_key = recording
            try:
                fn(results)
            finally:
                cc.get_cache_key = orig
            dt = time.perf_counter() - t0
            seen = set()
            n_hit = 0
            for i, (key, pre) in enumerate(captured):
                if key in seen:
                    continue
                seen.add(key)
                n_hit += bool(pre)
                records.append({
                    "program": f"downstream:{stage}:{len(seen) - 1}",
                    "key": key,
                    "compile_s": None,
                    "was_cached": bool(pre),
                })
            if verbose:
                print(f"  downstream:{stage:<35} {len(seen):3d} programs "
                      f"({n_hit} cached)  {dt:7.1f}s")
    finally:
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        _write_manifest(records)
    return records


def warm_eager_ops(config) -> int:
    """Execute the handful of EAGER micro-ops the schedule driver and
    exporter dispatch outside the big jitted programs: the per-stage
    ``fold_in`` key derivation, the per-stage-length loss readbacks
    (``float(losses[0])`` / ``float(losses[-1])`` in the verbose driver),
    and the Pallas sampler's seed draw.  On a relay-attached TPU every
    unique eager op is its own remote compile (~10-17 s observed,
    CLAUDE.md) — part of the cold-start bill warmup exists to pre-pay.
    Returns the number of ops dispatched."""
    import jax
    import jax.numpy as jnp

    n = 0
    rng = jax.random.key(config.seed + 1, impl=config.model.rng_impl)
    train_key, mc_key = jax.random.split(rng)
    jax.random.fold_in(train_key, 0)
    n += 1
    for n_iter in sorted({s.n_iter for s in config.schedule}):
        z = jnp.zeros((n_iter,), jnp.float32)
        float(z[0])
        float(z[-1])
        n += 2
    if jax.default_backend() == "tpu":
        # pipeline/export.py draws the Pallas kernel seed eagerly
        int(jax.random.randint(mc_key, (), 0, 2**31 - 1))
        n += 1
    return n


def _write_manifest(records: List[Dict]) -> Optional[str]:
    """Merge this run's program→key map into the cache-dir manifest
    (atomic; best-effort — a read-only cache dir must not fail warmup)."""
    cache_dir = resolve_cache_dir()
    if cache_dir is None:
        return None
    import datetime

    import jax

    try:
        path = os.path.join(cache_dir, MANIFEST_NAME)
        manifest = {"programs": {}}
        try:
            with open(path) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            pass
        programs = manifest.get("programs")
        if not isinstance(programs, dict):
            programs = {}
        platform = jax.default_backend()
        for rec in records:
            if rec["key"] and not rec["program"].startswith(
                NONPERSISTABLE_PREFIXES
            ):
                programs[f"{platform}:{rec['program']}"] = rec["key"]
        manifest = {
            "programs": programs,
            "updated": datetime.datetime.now(datetime.timezone.utc)
            .isoformat(timespec="seconds"),
            "jax": jax.__version__,
        }
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(tmp, path)
        return path
    except OSError:
        return None


def warmup_coverage() -> Dict:
    """Which warmed production programs are (still) cache-hits — pure
    filesystem check against the manifest; never initializes a backend.
    Returns {ok, detail, present, missing, updated} for `cli doctor`."""
    cache_dir = resolve_cache_dir()
    if cache_dir is None:
        return {
            "ok": True,
            "detail": "cache disabled (PINNFC_COMPILATION_CACHE_DIR='') — "
                      "no coverage to report",
            "present": [], "missing": [], "updated": None,
        }
    path = os.path.join(cache_dir, MANIFEST_NAME)
    try:
        with open(path) as f:
            manifest = json.load(f)
        programs = manifest.get("programs") or {}
        assert isinstance(programs, dict)
    except (OSError, ValueError, AssertionError):
        return {
            "ok": True,
            "detail": "no warmup manifest — run `cli warmup` once to "
                      "pre-compile the production programs (a cold box "
                      "otherwise pays minutes of remote compiles at first "
                      "use)",
            "present": [], "missing": [], "updated": None,
        }
    present, missing = [], []
    for name, key in sorted(programs.items()):
        (present if os.path.exists(os.path.join(cache_dir, str(key) + "-cache"))
         else missing).append(name)
    detail = (
        f"{len(present)}/{len(programs)} warmed production programs cached"
        f" (manifest {manifest.get('updated', '?')}, jax "
        f"{manifest.get('jax', '?')})"
    )
    if missing:
        detail += ("; STALE — re-run `cli warmup` (evicted/cleared or a "
                   "jax upgrade changed keys): "
                   + ", ".join(missing[:6])
                   + ("…" if len(missing) > 6 else ""))
    # stale coverage is a performance condition, not a health failure:
    # ok stays True so orchestration gating on doctor's exit code does
    # not fail a functional box (e.g. after every jax upgrade, when ALL
    # keys change); the `stale` field carries the actionable signal
    return {
        "ok": True,
        "stale": bool(missing),
        "detail": detail,
        "present": present,
        "missing": missing,
        "updated": manifest.get("updated"),
    }
