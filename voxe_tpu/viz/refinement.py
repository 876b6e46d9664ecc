"""Refinement-stage visual diagnostics (PNG dumps).

The reference logs these to wandb (refinement_functions.py:19-174 +
attn_grid_trainer.py feedback hooks); this framework writes the same set as
PNGs under the run's rendered_output dir so graph-cut quality is debuggable
offline:

* edit / object / diff 2D attention maps (jet-colormapped)
* per-token mask / predicted-attn / masked-diff of the attn-grid render
* edit-vs-object render difference
* 3D scatters of the voxel cloud: by attn-diff sign, in feature space, and by
  graph-cut cluster id
"""
from __future__ import annotations

from pathlib import Path

import matplotlib
import numpy as np


def _jet_png(arr: np.ndarray, path: Path, vmin=None, vmax=None) -> None:
    import imageio.v2 as imageio
    from matplotlib import colors

    arr = np.asarray(arr, dtype=np.float32)
    vmin = float(arr.min()) if vmin is None else vmin
    vmax = float(arr.max()) if vmax is None else vmax
    norm = colors.Normalize(vmin=vmin, vmax=vmax)
    frame = matplotlib.colormaps["jet"](norm(arr))[..., :3]
    imageio.imwrite(path, (frame * 255).astype(np.uint8))


def visualize_attention_maps(
    edit_attn_map, object_attn_map, step: int, out_dir: Path
) -> None:
    """Edit/object/diff jet maps (reference refinement_functions.py:19-39)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    e = np.asarray(edit_attn_map)
    o = np.asarray(object_attn_map)
    _jet_png(e, out_dir / f"edit_attn_map_{step}.png", vmin=0.0)
    _jet_png(o, out_dir / f"object_attn_map_{step}.png", vmin=0.0)
    _jet_png(e - o, out_dir / f"diff_attn_map_{step}.png")


def visualize_attn_render_diagnostics(
    attn_render, attn_map, token: str, step: int, out_dir: Path
) -> None:
    """Mask / predicted attn / masked diff of the attn-grid render
    (reference refinement_functions.py:42-76 viz branch)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    render = np.asarray(attn_render, dtype=np.float32).reshape(
        np.asarray(attn_map).shape
    )
    target = np.asarray(attn_map, dtype=np.float32)
    mask = (render > 0.0).astype(np.float32)
    diff_masked = np.abs(render - target) * mask
    _jet_png(mask, out_dir / f"mask_{token}_{step}.png", vmin=0.0)
    _jet_png(render, out_dir / f"pred_attn_{token}_{step}.png", vmin=0.0)
    _jet_png(diff_masked, out_dir / f"diff_masked_{token}_{step}.png", vmin=0.0)


def visualize_render_diff(
    edit_attn_render, object_attn_render, step: int, out_dir: Path
) -> None:
    """Edit-vs-object render difference (reference refinement_functions.py:
    81-87)."""
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    diff = np.asarray(edit_attn_render, np.float32) - np.asarray(
        object_attn_render, np.float32
    )
    _jet_png(diff, out_dir / f"render_diff_{step}.png")


def plot_attn_scatter(
    locations: np.ndarray,  # [N, 3] voxel coords
    features: np.ndarray,  # [N, 3] in [0, 1]
    edit_attn: np.ndarray,  # [N]
    object_attn: np.ndarray,  # [N]
    cluster_ids: np.ndarray,  # [N] graph-cut segments (0 = edit side)
    step: int,
    out_dir: Path,
    num_samples: int = 1000,
    seed: int = 0,
) -> None:
    """The reference's three 3D diagnostics scatters (refinement_functions.py:
    89-174): voxel cloud split by attn-diff sign, feature-space colored by
    attn diff, and voxel cloud split by graph-cut cluster id."""
    from matplotlib import pyplot as plt

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    locations = np.asarray(locations, np.float32)
    features = np.clip(np.asarray(features, np.float32), 0.0, 1.0)
    edit_attn = np.asarray(edit_attn, np.float32).reshape(-1)
    object_attn = np.asarray(object_attn, np.float32).reshape(-1)
    cluster_ids = np.asarray(cluster_ids).reshape(-1)

    rng = np.random.default_rng(seed)
    n = locations.shape[0]
    sel = rng.permutation(n)[: min(num_samples, n)]
    loc, feat = locations[sel], features[sel]
    diff = edit_attn[sel] - object_attn[sel]
    ids = cluster_ids[sel]

    def scatter_groups(path, groups):
        """Voxel cloud at `loc`, each point colored by its RGB feature."""
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
        for m, marker, label in groups:
            if not np.any(m):
                continue
            ax.scatter(
                loc[m, 0], loc[m, 1], loc[m, 2],
                marker=marker, c=feat[m], label=label,
            )
        ax.set_xlabel("X"), ax.set_ylabel("Y"), ax.set_zlabel("Z")
        ax.legend(loc="upper right", fontsize=7)
        fig.savefig(path, dpi=110)
        plt.close(fig)

    neg, pos = diff < 0.0, diff >= 0.0
    scatter_groups(
        out_dir / f"scatter3d_locations_{step}.png",
        [(neg, "o", "higher object attn"), (pos, "^", "higher edit attn")],
    )

    fig = plt.figure()
    ax = fig.add_subplot(projection="3d")
    ax.scatter(feat[:, 0], feat[:, 1], feat[:, 2], marker="o", c=diff, cmap="jet")
    ax.set_xlabel("X"), ax.set_ylabel("Y"), ax.set_zlabel("Z")
    fig.savefig(out_dir / f"scatter3d_features_{step}.png", dpi=110)
    plt.close(fig)

    zero, one = ids == 0, ids == 1
    scatter_groups(
        out_dir / f"scatter3d_ids_{step}.png",
        [(zero, "o", "edit cluster"), (one, "^", "object cluster")],
    )
