"""Explicit SH voxel-grid scene representation as a JAX pytree.

Rebuild of the reference's `VoxelGrid` nn.Module
(reference: thre3d_atom/thre3d_reprs/voxels.py:46-517) with TPU-first design:

* State is an immutable pytree (`VoxelGrid`) — densities [X,Y,Z,1],
  features [X,Y,Z,F], optional attn [X,Y,Z,1] and frozen orig_densities —
  that flows through jit/grad/optax untouched.
* All configuration is a hashable static dataclass (`VoxelGridConfig`);
  activations are *names* resolved through a registry, never pickled function
  objects (the reference pickles callables into checkpoints,
  volumetric_model.py:93 — a portability bug we do not replicate).
* The AABB is derived from static config + static shapes, so it folds into
  compiled constants under jit.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from voxe_tpu.ops.trilinear import trilinear_interpolate


class VoxelSize(NamedTuple):
    """Per-axis voxel edge lengths (anisotropic voxels allowed)."""

    x_size: float = 1.0
    y_size: float = 1.0
    z_size: float = 1.0


class VoxelGridLocation(NamedTuple):
    """World-space location of the grid center (grid is axis-aligned)."""

    x_coord: float = 0.0
    y_coord: float = 0.0
    z_coord: float = 0.0


class AxisAlignedBoundingBox(NamedTuple):
    x_range: Tuple[float, float]
    y_range: Tuple[float, float]
    z_range: Tuple[float, float]


# activation registry: names -> jnp functions (hashable + serializable config)
ACTIVATIONS = {
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "abs": jnp.abs,
    "softplus": jax.nn.softplus,
    "sigmoid": jax.nn.sigmoid,
}


@dataclasses.dataclass(frozen=True)
class VoxelGridConfig:
    """Static (hashable) grid configuration.

    Mirrors the reference constructor arguments
    (reference: thre3d_atom/thre3d_reprs/voxels.py:47-66) with activations by
    name. Defaults follow the reference defaults (abs pre-activation).
    """

    voxel_size: VoxelSize = VoxelSize()
    grid_location: VoxelGridLocation = VoxelGridLocation()
    density_preactivation: str = "abs"
    density_postactivation: str = "identity"
    feature_preactivation: str = "identity"
    feature_postactivation: str = "identity"
    expected_density_scale: float = 1.0
    # TPU perf knob: dtype of the materialized pre-activated table the
    # renderer gathers from. "bfloat16" halves the dominant HBM gather
    # traffic (~1.5x step speedup at 160^3) at ~1e-2 relative quantization
    # of the field; parameters and gradients stay float32 either way.
    gather_dtype: str = "float32"

    def to_json_dict(self):
        d = dataclasses.asdict(self)
        d["voxel_size"] = list(self.voxel_size)
        d["grid_location"] = list(self.grid_location)
        return d

    @staticmethod
    def from_json_dict(d) -> "VoxelGridConfig":
        d = dict(d)
        d["voxel_size"] = VoxelSize(*d["voxel_size"])
        d["grid_location"] = VoxelGridLocation(*d["grid_location"])
        return VoxelGridConfig(**d)


@jax.tree_util.register_pytree_node_class
class VoxelGrid:
    """Immutable voxel-grid pytree.

    Array leaves: densities [X,Y,Z,1], features [X,Y,Z,F], optional
    attn [X,Y,Z,1], optional orig_densities [X,Y,Z,1] (frozen copy used by the
    attention render path; reference voxels.py:110,344-406).
    """

    def __init__(
        self,
        densities: jnp.ndarray,
        features: jnp.ndarray,
        config: VoxelGridConfig = VoxelGridConfig(),
        attn: Optional[jnp.ndarray] = None,
        orig_densities: Optional[jnp.ndarray] = None,
    ):
        self.densities = densities
        self.features = features
        self.attn = attn
        self.orig_densities = orig_densities
        self.config = config

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        children = (self.densities, self.features, self.attn, self.orig_densities)
        return children, self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        densities, features, attn, orig_densities = children
        return cls(densities, features, config, attn, orig_densities)

    # -- derived static properties -------------------------------------------
    @property
    def grid_dims(self) -> Tuple[int, int, int]:
        return tuple(self.features.shape[:3])

    @property
    def aabb(self) -> AxisAlignedBoundingBox:
        """World-space AABB (reference voxels.py:198-223); static floats."""
        dims = self.grid_dims
        vs, loc = self.config.voxel_size, self.config.grid_location
        half = (
            dims[0] * vs.x_size / 2,
            dims[1] * vs.y_size / 2,
            dims[2] * vs.z_size / 2,
        )
        return AxisAlignedBoundingBox(
            x_range=(loc.x_coord - half[0], loc.x_coord + half[0]),
            y_range=(loc.y_coord - half[1], loc.y_coord + half[1]),
            z_range=(loc.z_coord - half[2], loc.z_coord + half[2]),
        )

    def replace(self, **kwargs) -> "VoxelGrid":
        new = dict(
            densities=self.densities,
            features=self.features,
            config=self.config,
            attn=self.attn,
            orig_densities=self.orig_densities,
        )
        new.update(kwargs)
        return VoxelGrid(**new)

    def with_frozen_orig_densities(self) -> "VoxelGrid":
        """Snapshot current densities as the frozen reference copy
        (reference voxels.py:134-135)."""
        return self.replace(orig_densities=jax.lax.stop_gradient(self.densities))


# ----------------------------------------------------------------------------------
# functional queries
# ----------------------------------------------------------------------------------


def _normalize_points(aabb: AxisAlignedBoundingBox, points: jnp.ndarray) -> jnp.ndarray:
    """Affine-map world points into [-1, 1]^3 of the grid (slack mode: no
    clipping; reference voxels.py:225-234 + imaging_utils.py:58-63)."""
    mins = jnp.array([aabb.x_range[0], aabb.y_range[0], aabb.z_range[0]])
    maxs = jnp.array([aabb.x_range[1], aabb.y_range[1], aabb.z_range[1]])
    scale = 2.0 / (maxs - mins)
    bias = -1.0 - mins * scale
    return points * scale + bias


def test_inside_volume(aabb: AxisAlignedBoundingBox, points: jnp.ndarray) -> jnp.ndarray:
    """[N, 1] bool: strictly inside the AABB (reference voxels.py:263-285)."""
    inside = (
        (points[..., 0:1] > aabb.x_range[0])
        & (points[..., 0:1] < aabb.x_range[1])
        & (points[..., 1:2] > aabb.y_range[0])
        & (points[..., 1:2] < aabb.y_range[1])
        & (points[..., 2:3] > aabb.z_range[0])
        & (points[..., 2:3] < aabb.z_range[1])
    )
    return inside


def grid_query(grid: VoxelGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Interpolated [features..., density] at world points [N, 3].

    Pipeline parity (reference voxels.py:287-342): density pre-activation is
    applied to raw * expected_density_scale BEFORE interpolation; the
    post-activation AFTER; same for the feature pre/post pair.
    """
    cfg = grid.config
    normalized = _normalize_points(grid.aabb, points)

    d_pre = ACTIVATIONS[cfg.density_preactivation]
    d_post = ACTIVATIONS[cfg.density_postactivation]
    f_pre = ACTIVATIONS[cfg.feature_preactivation]
    f_post = ACTIVATIONS[cfg.feature_postactivation]

    pre_density = d_pre(grid.densities * cfg.expected_density_scale)
    pre_features = f_pre(grid.features)
    # one fused gather over the concatenated channels
    unified = jnp.concatenate([pre_features, pre_density], axis=-1)
    if cfg.gather_dtype == "bfloat16":
        unified = unified.astype(jnp.bfloat16)
    interpolated = trilinear_interpolate(unified, normalized).astype(jnp.float32)
    feats = f_post(interpolated[..., :-1])
    dens = d_post(interpolated[..., -1:])
    return jnp.concatenate([feats, dens], axis=-1)


def grid_query_attn(
    grid: VoxelGrid, points: jnp.ndarray, use_orig_densities: bool = False
) -> jnp.ndarray:
    """Attention-channel query: [attn, density] at world points [N, 3]
    (reference voxels.py:344-406). With `use_orig_densities`, densities come
    from the frozen pre-edit copy so attn grids are trained against stable
    geometry."""
    cfg = grid.config
    assert grid.attn is not None, "grid has no attn channel"
    normalized = _normalize_points(grid.aabb, points)

    d_pre = ACTIVATIONS[cfg.density_preactivation]
    d_post = ACTIVATIONS[cfg.density_postactivation]
    f_pre = ACTIVATIONS[cfg.feature_preactivation]
    f_post = ACTIVATIONS[cfg.feature_postactivation]

    densities = grid.orig_densities if use_orig_densities else grid.densities
    if use_orig_densities:
        assert grid.orig_densities is not None, "no frozen orig_densities"
    pre_density = d_pre(densities * cfg.expected_density_scale)
    pre_attn = f_pre(grid.attn)
    unified = jnp.concatenate([pre_attn, pre_density], axis=-1)
    # honor gather_dtype exactly like grid_query (and like the shear-warp
    # attn path, shearwarp.py attn_mode) so the exact and fast attn renders
    # interpolate at the same precision
    if cfg.gather_dtype == "bfloat16":
        unified = unified.astype(jnp.bfloat16)
    interpolated = trilinear_interpolate(unified, normalized).astype(jnp.float32)
    attn = f_post(interpolated[..., :-1])
    dens = d_post(interpolated[..., -1:])
    return jnp.concatenate([attn, dens], axis=-1)


# ----------------------------------------------------------------------------------
# rescaling (coarse-to-fine training)
# ----------------------------------------------------------------------------------


def scale_voxel_grid(
    grid: VoxelGrid, output_size: Tuple[int, int, int], include_attn: bool = False
) -> VoxelGrid:
    """Trilinearly resample the grid to `output_size`
    (reference voxels.py:409-488). Voxel size rescales so the world-space AABB
    is preserved. Uses `jax.image.resize` (half-pixel centers ==
    align_corners=False)."""
    channels = [grid.features, grid.densities]
    if include_attn:
        assert grid.attn is not None
        channels.append(grid.attn)
    unified = jnp.concatenate(channels, axis=-1)
    new_unified = jax.image.resize(
        unified, (*output_size, unified.shape[-1]), method="trilinear"
    )

    vs = grid.config.voxel_size
    dims = grid.grid_dims
    new_voxel_size = VoxelSize(
        vs.x_size * dims[0] / output_size[0],
        vs.y_size * dims[1] / output_size[1],
        vs.z_size * dims[2] / output_size[2],
    )
    new_config = dataclasses.replace(grid.config, voxel_size=new_voxel_size)

    num_feat = grid.features.shape[-1]
    new_features = new_unified[..., :num_feat]
    new_densities = new_unified[..., num_feat : num_feat + 1]
    new_attn = new_unified[..., num_feat + 1 : num_feat + 2] if include_attn else None
    return VoxelGrid(
        densities=new_densities,
        features=new_features,
        config=new_config,
        attn=new_attn,
    )
