"""Device-mesh utilities: data-parallel ray batching over ICI.

The reference is strictly single-GPU (SURVEY.md section 2: no torch.distributed
anywhere); this module is the TPU-native scaling layer it never had. Design
(per the scaling-book recipe): pick a mesh, annotate shardings, let XLA insert
collectives.

* Grids/optimizer state are small (a 160^3 x 5 f32 grid is ~82 MB) ->
  REPLICATED over the mesh.
* Ray batches (and everything derived per-ray: samples, gathers, compositing)
  -> SHARDED over the `rays` axis. The mean-loss + grad of replicated params
  makes GSPMD insert the psum gradient reduction automatically; gradients ride
  the ICI all-reduce.
* The SD UNet (editing path) uses the same mesh with batch(=CFG/direction)
  sharding; see voxe_tpu.models.sd.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

RAY_AXIS = "rays"


def make_mesh(num_devices: Optional[int] = None, axis_name: str = RAY_AXIS) -> Mesh:
    """1-D mesh over the first `num_devices` devices (default: all)."""
    devices = jax.devices()
    if num_devices is not None:
        assert num_devices <= len(devices), (
            f"requested {num_devices} devices, only {len(devices)} available"
        )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def maybe_mesh(num_devices: int = 1, axis_name: str = RAY_AXIS) -> Optional[Mesh]:
    """The trainers' user-facing entry: None (single-device semantics) for
    num_devices <= 1, else a 1-D ray-DP mesh over that many devices."""
    if num_devices <= 1:
        return None
    return make_mesh(num_devices, axis_name)


def shard_rays(mesh: Mesh, value, axis_name: str = RAY_AXIS):
    """Constrain a per-ray array (leading dim = rays) to be sharded over the
    mesh's ray axis. Used inside jitted train steps."""
    ndim = value.ndim if hasattr(value, "ndim") else 1
    spec = P(axis_name, *([None] * (ndim - 1)))
    return jax.lax.with_sharding_constraint(value, NamedSharding(mesh, spec))


def shard_axis(mesh: Mesh, value, axis: int, axis_name: str = RAY_AXIS):
    """Constrain an arbitrary axis of `value` to be sharded over the mesh
    (shear-warp renderer: DP over base-image rows instead of flat rays)."""
    spec = [None] * value.ndim
    spec[axis] = axis_name
    return jax.lax.with_sharding_constraint(value, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Constrain a pytree to be fully replicated over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(x, sharding), tree
    )
