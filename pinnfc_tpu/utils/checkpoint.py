"""Parameter checkpoint / resume.

The reference never saves model weights — its only artifact is
``F01_output.mat`` (01:2185-2187).  SURVEY §5 adds standard checkpointing:
the PINN pytree (MLP weights + 17 physics λ's) and the scalers round-trip
through Orbax, with a plain-npz fallback for environments without Orbax.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pinnfc_tpu.data.scaling import AffineScaler


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix.rstrip("/")] = np.asarray(tree)
    return out


def save_params_npz(params: Dict[str, Any], path: str) -> None:
    """Flatten the params pytree to an .npz archive.  The write is atomic
    (``utils.io.atomic_savez``) so a process killed mid-save — the whole
    point of preemption checkpoints — can never leave a truncated archive
    behind."""
    from pinnfc_tpu.utils.io import atomic_savez

    atomic_savez(path, **_flatten(params))


def load_params_npz(path: str) -> Dict[str, Any]:
    """Rebuild the nested dict/list pytree from the flat archive."""
    flat = dict(np.load(path))

    def insert(root, keys, value):
        key = keys[0]
        if len(keys) == 1:
            root[key] = jnp.asarray(value)
            return
        root.setdefault(key, {})
        insert(root[key], keys[1:], value)

    nested: Dict[str, Any] = {}
    for k, v in flat.items():
        insert(nested, k.split("/"), v)

    def listify(node):
        if isinstance(node, dict):
            keys = list(node.keys())
            # only a CONTIGUOUS 0..n-1 digit key set is a flattened
            # list/tuple; anything else (e.g. a dict legitimately keyed
            # '0','2') stays a dict so the round trip preserves structure
            if keys and all(k.isdigit() for k in keys) and set(keys) == {
                str(i) for i in range(len(keys))
            }:
                return [listify(node[str(i)]) for i in range(len(keys))]
            return {k: listify(v) for k, v in node.items()}
        return node

    return listify(nested)


def _meta_path(path: str) -> str:
    return os.path.abspath(path) + ".meta.json"


def save_checkpoint(
    path: str,
    params: Dict[str, Any],
    scaler_x: Optional[AffineScaler] = None,
    scaler_y: Optional[AffineScaler] = None,
    step: int = 0,
    meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Orbax checkpoint of params (+ scalers as arrays).  Falls back to npz
    when Orbax is unavailable.

    ``meta`` (JSON-serializable provenance — training config, data sizes,
    final metrics) is written to a ``<path>.meta.json`` sidecar so it can be
    read without deserializing any arrays; ``cli score`` uses it to default
    the MC-export settings to the ones the checkpoint was trained with.
    The sidecar is written AFTER the arrays (a save that dies mid-way never
    leaves provenance describing arrays that were not written), and a save
    WITHOUT meta removes any stale sidecar a previous occupant of the path
    left behind — the sidecar must never describe a different model."""
    payload: Dict[str, Any] = {"params": params, "step": np.asarray(step)}
    if scaler_x is not None:
        payload["scaler_x"] = scaler_x.to_numpy()
    if scaler_y is not None:
        payload["scaler_y"] = scaler_y.to_numpy()
    # materialize to host numpy first: otherwise orbax records the SAVING
    # platform's sharding and a checkpoint written on the TPU cannot be
    # restored in a CPU process ("sharding ... Got None")
    payload = jax.tree_util.tree_map(np.asarray, payload)
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, payload, force=True)
    except ImportError:
        save_params_npz(payload, path + ".npz")
    if meta is not None:
        import json

        from pinnfc_tpu.utils.io import atomic_write_text

        atomic_write_text(
            _meta_path(path),
            # numpy scalars AND arrays both coerce via tolist (item()
            # raises on multi-element arrays)
            json.dumps(
                meta, indent=2, ensure_ascii=False,
                default=lambda o: o.tolist() if hasattr(o, "tolist")
                else str(o),
            ),
        )
    else:
        try:
            os.remove(_meta_path(path))
        except FileNotFoundError:
            pass


def load_checkpoint_raw(path: str) -> Dict[str, Any]:
    """Like ``load_checkpoint`` but keeps the scalers as their raw numpy
    dicts (``AffineScaler.to_numpy`` layout) instead of rebuilding
    ``AffineScaler`` objects: no jnp conversions of our own, so host-numpy
    checkpoints introspect (``cli inspect``) without waking the accelerator
    relay."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        abspath = os.path.abspath(path)
        try:
            payload = ckptr.restore(abspath)
        except Exception:
            # checkpoints written on an accelerator carry that device's
            # sharding, which a CPU process cannot reconstruct; force
            # plain-numpy deserialization instead
            meta = ckptr.metadata(abspath).item_metadata
            tree = meta.tree if hasattr(meta, "tree") else meta
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
            )
            payload = ckptr.restore(abspath, restore_args=restore_args)
    except ImportError:
        payload = load_params_npz(path + ".npz")
    except FileNotFoundError:
        # saved by the npz fallback (no orbax at save time)
        payload = load_params_npz(path + ".npz")
    out = dict(payload)
    meta = load_checkpoint_meta(path)
    if meta is not None:
        out["meta"] = meta
    return out


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load an Orbax (or npz-fallback) checkpoint; arrays come back as host
    numpy regardless of the platform that wrote them, scalers as
    ``AffineScaler`` objects, provenance (if any) under ``'meta'``."""
    out = load_checkpoint_raw(path)
    if "scaler_x" in out:
        out["scaler_x"] = AffineScaler.from_numpy(out["scaler_x"])
    if "scaler_y" in out:
        out["scaler_y"] = AffineScaler.from_numpy(out["scaler_y"])
    return out


def load_checkpoint_meta(path: str) -> Optional[Dict[str, Any]]:
    """Read the ``<path>.meta.json`` provenance sidecar (None if absent —
    checkpoints written before metadata existed, or saved without it).
    Cheap: no array deserialization.  A corrupt sidecar (e.g. truncated by
    a non-atomic copy channel) must never block loading intact arrays: it
    degrades to None with a warning."""
    import json
    import warnings

    try:
        with open(_meta_path(path)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None
    except (OSError, json.JSONDecodeError, UnicodeDecodeError) as e:
        warnings.warn(
            f"ignoring unreadable checkpoint metadata sidecar "
            f"{_meta_path(path)!r}: {e}", stacklevel=2,
        )
        return None
