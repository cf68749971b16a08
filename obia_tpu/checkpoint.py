"""Checkpoint / resume subsystem.

The reference has no checkpointing mechanism at all (SURVEY.md §5 — its
only restart points are durable output files; ``train_model`` never saves
the model, reference detection/train.py:11-50). This module provides:

* :func:`save_pytree` / :func:`load_pytree` — orbax-backed checkpointing of
  arbitrary JAX pytrees (model params, optimiser state), with a plain
  ``.npz`` fallback when orbax is unavailable.
* :class:`TileManifest` — a tile-granular job manifest so multi-tile mosaic
  runs (``create_tiled_segments`` / ``segment_mosaic``) can resume after a
  failure: each tile's status is durably recorded and completed tiles are
  skipped on re-run.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
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


def _unflatten_like(like: Any, data, prefix: str = "") -> Any:
    """Rebuild the ``like`` structure (dicts/lists/tuples/namedtuples)
    from the flat key->array mapping ``_flatten`` produced, restoring
    leaf dtypes from the template."""
    if isinstance(like, dict):
        return {k: _unflatten_like(v, data, f"{prefix}{k}/")
                for k, v in like.items()}
    if isinstance(like, (list, tuple)):
        vals = [_unflatten_like(v, data, f"{prefix}{i}/")
                for i, v in enumerate(like)]
        if hasattr(like, "_fields"):  # namedtuple
            return type(like)(*vals)
        return type(like)(vals)
    leaf = np.asarray(data[prefix.rstrip("/")])
    want = np.asarray(like).dtype
    return leaf if leaf.dtype == want else leaf.astype(want)


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays. Uses orbax when installed (directory
    checkpoint), else a flat .npz file. The orbax save goes to a temp
    directory first so a failure never destroys the previous good
    checkpoint; an absent orbax is the documented plain-.npz
    configuration, not a warning."""
    import importlib.util
    import shutil

    if importlib.util.find_spec("orbax") is not None:
        tmp = os.path.abspath(path) + ".orbax_tmp"
        try:
            import orbax.checkpoint as ocp
            import jax
            ckptr = ocp.StandardCheckpointer()
            shutil.rmtree(tmp, ignore_errors=True)
            ckptr.save(tmp, jax.tree_util.tree_map(np.asarray, tree),
                       force=True)
            ckptr.wait_until_finished()
            if os.path.isdir(path):
                shutil.rmtree(path)
            os.replace(tmp, path)
            return
        except Exception as e:
            import warnings
            shutil.rmtree(tmp, ignore_errors=True)
            warnings.warn(f"orbax checkpoint save failed ({e!r}); "
                          "falling back to .npz")
    flat = _flatten(tree)
    np.savez(path if path.endswith(".npz") else path + ".npz", **flat)
    # only now — with the fresh .npz on disk — is it safe to drop a
    # stale orbax DIRECTORY that would shadow it at load time
    # (load_pytree prefers the directory)
    if os.path.isdir(path):
        shutil.rmtree(path, ignore_errors=True)


def load_pytree(path: str, like: Optional[Any] = None) -> Any:
    """Load a checkpoint saved by :func:`save_pytree`. ``like`` provides the
    target structure for orbax restoration (required for exact dtypes)."""
    if os.path.isdir(path):
        import orbax.checkpoint as ocp
        ckptr = ocp.StandardCheckpointer()
        if like is not None:
            import jax
            template = jax.tree_util.tree_map(np.asarray, like)
            return ckptr.restore(os.path.abspath(path), template)
        return ckptr.restore(os.path.abspath(path))
    npz_path = path if path.endswith(".npz") else path + ".npz"
    data = np.load(npz_path)
    if like is not None:
        # restore the template's container types (tuples/lists would
        # otherwise come back as dicts keyed '0', '1', ...) and dtypes
        return _unflatten_like(like, data)
    tree: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


class TileManifest:
    """Durable per-tile job status for resumable mosaic runs."""

    def __init__(self, path: str):
        self.path = path
        self.state: Dict[str, Dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self.state = json.load(f)

    def is_done(self, tile_id: str) -> bool:
        return self.state.get(tile_id, {}).get("status") == "done"

    def mark(self, tile_id: str, status: str, **extra) -> None:
        self.state[tile_id] = {"status": status, **extra}
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1)
        os.replace(tmp, self.path)

    def pending(self, tile_ids: List[str]) -> List[str]:
        return [t for t in tile_ids if not self.is_done(t)]

    def failed(self) -> List[str]:
        return [t for t, v in self.state.items()
                if v.get("status") == "failed"]
