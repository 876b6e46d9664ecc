"""Full training-state checkpointing (grid + optimizer state + progress).

The reference only saves model snapshots — no optimizer state, no mid-run
resume (SURVEY.md section 5: "No optimizer state is saved and no mid-run
resume exists"). This module adds both: any pytree (e.g. an optax state) is
flattened with key-paths into an npz archive next to a JSON progress record,
and restored against a freshly-initialized template of the same structure.
"""
from __future__ import annotations

import io
import json
from pathlib import Path
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _path_str(path) -> str:
    out = []
    for entry in path:
        if hasattr(entry, "key"):
            out.append(str(entry.key))
        elif hasattr(entry, "idx"):
            out.append(str(entry.idx))
        elif hasattr(entry, "name"):
            out.append(str(entry.name))
        else:  # pragma: no cover
            out.append(str(entry))
    return "/".join(out)


def save_training_state(
    path: Path, state_tree: Any, metadata: Dict[str, Any]
) -> None:
    """Write a pytree + JSON metadata as one npz file."""
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    leaves = jax.tree_util.tree_flatten_with_path(state_tree)[0]
    arrays = {f"leaf::{_path_str(p)}": np.asarray(v) for p, v in leaves}
    buf = io.BytesIO()
    np.savez(
        buf,
        __meta__=np.frombuffer(json.dumps(metadata).encode(), dtype=np.uint8),
        **arrays,
    )
    path.write_bytes(buf.getvalue())


def load_training_state(
    path: Path, state_template: Any
) -> Tuple[Any, Dict[str, Any]]:
    """Restore a pytree saved by `save_training_state` into the structure of
    `state_template` (shapes/paths must match). Returns (state, metadata)."""
    with np.load(Path(path), allow_pickle=False) as data:
        metadata = json.loads(bytes(data["__meta__"].tobytes()).decode())
        stored = {k[len("leaf::") :]: data[k] for k in data.files if k.startswith("leaf::")}

    paths_and_leaves = jax.tree_util.tree_flatten_with_path(state_template)
    leaves, treedef = paths_and_leaves[0], paths_and_leaves[1]
    new_leaves = []
    for p, template_leaf in leaves:
        key = _path_str(p)
        assert key in stored, f"checkpoint missing leaf {key}"
        value = stored[key]
        assert value.shape == tuple(np.shape(template_leaf)), (
            f"{key}: stored shape {value.shape} != template "
            f"{np.shape(template_leaf)}"
        )
        new_leaves.append(jnp.asarray(value))
    return jax.tree_util.tree_unflatten(treedef, new_leaves), metadata
