"""Operational subcommands: `doctor` (deployment self-check) and
`bench` (the headline benchmark)."""

from __future__ import annotations

import json
import os
import sys


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
