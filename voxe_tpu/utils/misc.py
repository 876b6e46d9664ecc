"""Miscellaneous helpers (reference: thre3d_atom/utils/misc.py:1-58)."""
from pathlib import Path
from typing import Dict, Sequence, Tuple

import numpy as np

from voxe_tpu.utils.constants import NUM_COORD_DIMENSIONS


def compute_thre3d_grid_sizes(
    final_required_resolution: Tuple[int, int, int],
    num_stages: int,
    scale_factor: float,
) -> Sequence[Tuple[int, int, int]]:
    """Stagewise coarse-to-fine grid resolutions, smallest first
    (reference: thre3d_atom/utils/misc.py:38-50)."""
    x, y, z = final_required_resolution
    grid_sizes = [(x, y, z)]
    for _ in range(num_stages - 1):
        x = int(np.ceil((1 / scale_factor) * x))
        y = int(np.ceil((1 / scale_factor) * y))
        z = int(np.ceil((1 / scale_factor) * z))
        grid_sizes.insert(0, (x, y, z))
    return grid_sizes


def compute_expected_density_scale_for_relu_field_grid(
    grid_world_size: Tuple[float, float, float],
) -> float:
    """Density scale heuristic = (sqrt(27) * 100 / diagonal) / 3
    (reference: thre3d_atom/rendering/volumetric/utils/misc.py:77-87)."""
    diagonal_norm = float(np.sqrt(np.sum([d**2 for d in grid_world_size])))
    percent_density_scale, constant_grid_norm = 100.0, float(np.sqrt(3.0**3))
    return ((constant_grid_norm * percent_density_scale) / diagonal_norm) / (
        NUM_COORD_DIMENSIONS
    )


def batchify(processor_fn, collate_fn=None, chunk_size: int = 65536):
    """Chunk-map `processor_fn` over the leading axis (memory valve).

    API-parity port of the reference's host-side batchify
    (reference: thre3d_atom/utils/misc.py:14-35). Under XLA this is rarely
    needed (the facade's lax.map chunking covers full-image renders), but the
    utility is kept for custom pipelines. Works with jnp inputs; chunks are
    processed sequentially on the host loop, so use OUTSIDE jit.
    """

    def _default_collate(chunks):
        import jax.numpy as jnp

        return jnp.concatenate(chunks, axis=0)

    collate = collate_fn or _default_collate

    def wrapped(x, *args, **kwargs):
        n = x.shape[0]
        if n <= chunk_size:
            return processor_fn(x, *args, **kwargs)
        outs = []
        for start in range(0, n, chunk_size):
            outs.append(processor_fn(x[start : start + chunk_size], *args, **kwargs))
        return collate(outs)

    return wrapped


def check_power_of_2(x: int) -> bool:
    """(reference: thre3d_atom/utils/misc.py:10-12)"""
    return x != 0 and (x & (x - 1)) == 0


class EasyDict(dict):
    """Attribute-style dict (stand-in for the easydict dependency the
    reference CLIs use; not installed in this image)."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(name) from e

    def __setattr__(self, name, value):
        self[name] = value


def log_config_to_disk(config: Dict, output_dir: Path, name: str = "config") -> None:
    """Dump the run configuration as a YAML-ish text file
    (reference: thre3d_atom/utils/misc.py:53-58). Written without pyyaml to
    avoid the dependency; values are repr()d line by line."""
    output_dir.mkdir(parents=True, exist_ok=True)
    with open(output_dir / f"{name}.yml", "w") as f:
        for key in sorted(config):
            f.write(f"{key}: {config[key]!r}\n")
