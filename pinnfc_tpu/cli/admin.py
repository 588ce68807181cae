"""Operational subcommands: `doctor` (deployment self-check), `warmup`
(persistent-cache pre-compilation) and `bench` (the headline benchmark)."""

from __future__ import annotations

import json
import os
import sys
import time


def cmd_warmup(args) -> int:
    """Pre-compile the production program set into the persistent cache
    (utils/warmup.py): every staged-schedule program at the configured
    lengths/shapes, the MC exporter, the metrics program and (with
    --ckpt) the serving monitor step — AOT, nothing executed.  A cold
    box otherwise pays 15+ minutes of remote compiles at first `cli
    train` (BENCH_r04 compile_s=1112); after warmup the same run
    compiles in seconds.  Resumable: already-cached programs are
    near-instant, so an interrupted warmup continues where it stopped."""
    from pinnfc_tpu.cli._common import _campaign_from_args, _train_config
    from pinnfc_tpu.utils.warmup import (
        _dataset_for,
        production_lowerings,
        resolve_cache_dir,
        warm_cache,
    )

    cache_dir = resolve_cache_dir()
    if cache_dir is None:
        print("persistent cache disabled (PINNFC_COMPILATION_CACHE_DIR='') "
              "— warmup would compile into thin air", file=sys.stderr)
        return 2
    cfg = _train_config(args)
    n_normal = getattr(args, "n_normal", None) or (1500 if args.small else 6000)
    n_fault = getattr(args, "n_fault", None) or (200 if args.small else 800)
    try:
        campaign = _campaign_from_args(args)
    except ValueError as e:
        print(e, file=sys.stderr)
        return 2

    import jax

    print(f"warming {jax.default_backend()} programs into {cache_dir} "
          f"(schedule: {len(cfg.schedule)} stages, mc_times={cfg.mc_times})")
    t0 = time.perf_counter()
    dataset = _dataset_for(cfg, n_normal, n_fault, campaign=campaign)
    print(f"  dataset built in {time.perf_counter() - t0:.1f}s "
          f"(x_train {tuple(dataset.x_train.shape)}, "
          f"x_test {tuple(dataset.x_test.shape)}; data programs warmed as "
          "a side effect)")
    progs = production_lowerings(
        cfg, dataset, ckpt_path=getattr(args, "ckpt", None),
        block=getattr(args, "block", 64),
    )
    records = warm_cache(progs, verbose=not args.json)
    if getattr(args, "mat", None):
        # downstream-diagnosis programs for a concrete artifact: running
        # the four cheap pipelines once IS the warmup (utils/warmup.py)
        from pinnfc_tpu.data import load_comprehensive_results
        from pinnfc_tpu.utils.warmup import warm_downstream

        records += warm_downstream(
            load_comprehensive_results(args.mat), verbose=not args.json
        )
    from pinnfc_tpu.utils.warmup import warm_eager_ops

    n_eager = warm_eager_ops(cfg)
    if not args.json:
        print(f"  + {n_eager} eager micro-ops (per-stage fold_in / loss "
              "readbacks) dispatched")
    total = sum(r["compile_s"] or 0 for r in records)
    hits = sum(1 for r in records if r["was_cached"])
    if args.json:
        print(json.dumps({"programs": records,
                          "total_compile_s": round(total, 1),
                          "already_cached": hits}))
    else:
        n_down = sum(r["program"].startswith("downstream:") for r in records)
        tail = (f" + {n_down} downstream programs" if n_down else "")
        print(f"warmed {len(records) - n_down} programs in {total:.1f}s "
              f"({hits} were already cached){tail}")
    return 0


def cmd_doctor(args) -> int:
    """Deployment self-check: environment, caches, backend reachability,
    and optional checkpoint/artifact pre-flight (see utils/doctor.py).

    The reference has no equivalent — its scripts assume a healthy local
    torch install.  On a relay-attached TPU the failure modes (stalled
    handshakes, poisoned compile caches, cpu-only artifacts on a TPU
    host) deserve a bounded first-line diagnostic."""
    from pinnfc_tpu.utils.doctor import run_doctor

    checks = run_doctor(
        probe_timeout=args.probe_timeout,
        platform=args.platform,
        skip_probe=args.skip_probe,
        smoke=args.smoke,
        ckpt=args.ckpt,
        artifact=args.artifact,
    )
    if args.json:
        print(json.dumps(checks))
    else:
        for c in checks:
            print(f"[{'ok' if c['ok'] else 'FAIL':>4}] {c['name']:<18} {c['detail']}")
    return 0 if all(c["ok"] for c in checks) else 1


def cmd_bench(args) -> int:
    try:
        import bench
    except ImportError:  # bench.py lives at the repo root, next to the package
        # cli/ is one level deeper than the old single-module cli.py
        repo_root = os.path.dirname(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        )
        sys.path.insert(0, repo_root)
        import bench

    bench.main()
    return 0
