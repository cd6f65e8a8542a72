"""Checkpoint / resume for training state.

The reference has no checkpointing at all (SURVEY.md §5: "none anywhere");
this fills the gap for production use. State (param/opt pytrees + epoch
counter) is saved as a flat .npz keyed by tree paths, so checkpoints are
framework-version tolerant and human-inspectable.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def save_checkpoint(path: str, params, opt_state, epoch: int,
                    extra: dict | None = None) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    payload = {f"params/{k}": v for k, v in _flatten(params).items()}
    payload.update(
        {f"opt/{k}": v for k, v in _flatten(opt_state).items()}
    )
    payload["meta/epoch"] = np.asarray(epoch)
    for k, v in (extra or {}).items():
        payload[f"extra/{k}"] = np.asarray(v)
    tmp = path + ".tmp"
    np.savez(tmp, **payload)
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)
    return path


def load_checkpoint(path: str, params_template, opt_state_template):
    """Restore into the given pytree templates (shapes must match)."""
    data = np.load(path, allow_pickle=False)

    def restore(tree, prefix):
        flat = _flatten(tree)
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        new_leaves = []
        keys = list(flat.keys())
        assert len(keys) == len(leaves)
        for key, leaf in zip(keys, leaves):
            stored = data[f"{prefix}/{key}"]
            assert stored.shape == np.asarray(leaf).shape, (
                f"checkpoint shape mismatch at {prefix}/{key}: "
                f"{stored.shape} vs {np.asarray(leaf).shape}"
            )
            new_leaves.append(jax.numpy.asarray(stored))
        return jax.tree_util.tree_unflatten(treedef, new_leaves)

    params = restore(params_template, "params")
    opt_state = restore(opt_state_template, "opt")
    epoch = int(data["meta/epoch"])
    return params, opt_state, epoch
