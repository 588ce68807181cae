"""Shared filesystem write discipline.

Every artifact writer in the framework (param checkpoints, the
``F01_output.mat`` contract, diagnosis heads, serving state banks) needs
the same two behaviors, so they live here once:

- ``ensure_parent``: create the destination's parent directories — failing
  at save time would throw away a completed training run (the reference
  never saves anything, so this surface is new; SURVEY §5).
- ``atomic_savez``: ``np.savez`` through a tmp file + ``os.replace`` so a
  process killed mid-write can never leave a truncated archive behind —
  the whole point of preemption-safe snapshots.
"""

from __future__ import annotations

import os

import numpy as np


def ensure_parent(path: str) -> None:
    """Create the parent directory of ``path`` if it has one."""
    parent = os.path.dirname(path)
    if parent:
        os.makedirs(parent, exist_ok=True)


def atomic_write_text(path: str, text: str) -> None:
    """Atomic text write (tmp file + ``os.replace``), same discipline as
    ``atomic_savez`` — used for checkpoint metadata sidecars."""
    ensure_parent(path)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(text)
    os.replace(tmp, path)


def atomic_savez(path: str, **arrays) -> None:
    """Atomic ``np.savez``: write a tmp file, then rename over ``path``.

    The tmp name ends in .npz so ``np.savez`` writes EXACTLY that path (it
    appends .npz otherwise, and an existence probe could then be fooled by
    a stale ``<path>.tmp`` left behind by something else)."""
    ensure_parent(path)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **arrays)
    os.replace(tmp, path)
