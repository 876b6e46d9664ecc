"""Hybrid grid+MLP scene representation (the reference's `FeatureVoxelGrid`).

Rebuild of reference: thre3d_atom/thre3d_reprs/feature_voxels.py:47-417 — a
DVGO-style representation where the grid stores *abstract* features and a
small MLP head ("rgbnet") decodes interpolated features to radiance; a second
head ("densitynet") exists in the reference but its application is commented
out of the live forward (feature_voxels.py:338), so it defaults OFF here and
is kept behind a config switch for completeness.

The reference never imports this class anywhere (SURVEY.md 2.13 documents it
as dead code); it is rebuilt regardless so the model family is available.

TPU-first notes:
* The MLP runs on the flat [N*S, F] interpolated-feature matrix — one big
  batched matmul chain per layer, exactly the shape the MXU wants. No
  per-point Python loop, no chunking.
* Parameters are plain pytree leaves (list of (kernel, bias) pairs), so the
  whole representation flows through jit/grad/optax like `VoxelGrid` does.
* Config is a hashable static dataclass with activations by NAME (never
  pickled callables — same policy as voxels.py).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from voxe_tpu.grid.voxels import (
    ACTIVATIONS,
    AxisAlignedBoundingBox,
    VoxelGridLocation,
    VoxelSize,
    _normalize_points,
)
from voxe_tpu.ops.trilinear import trilinear_interpolate

MLPParams = List[Tuple[jnp.ndarray, jnp.ndarray]]  # [(kernel [I,O], bias [O])]


@dataclasses.dataclass(frozen=True)
class FeatureVoxelGridConfig:
    """Static configuration (reference feature_voxels.py:48-72 constructor).

    Defaults mirror the reference: abs density pre-activation, identity
    everything else, 64-wide 4-deep heads, densitynet present but inert.
    """

    voxel_size: VoxelSize = VoxelSize()
    grid_location: VoxelGridLocation = VoxelGridLocation()
    density_preactivation: str = "abs"
    density_postactivation: str = "identity"
    feature_preactivation: str = "identity"
    feature_postactivation: str = "identity"
    expected_density_scale: float = 1.0
    rgbnet_width: int = 64
    rgbnet_depth: int = 4
    densitynet_width: int = 64
    densitynet_depth: int = 4
    # the reference constructs densitynet but comments its use out of
    # forward (feature_voxels.py:338) — keep parity: off by default
    use_densitynet: bool = False
    gather_dtype: str = "float32"

    def to_json_dict(self):
        d = dataclasses.asdict(self)
        d["voxel_size"] = list(self.voxel_size)
        d["grid_location"] = list(self.grid_location)
        return d

    @staticmethod
    def from_json_dict(d) -> "FeatureVoxelGridConfig":
        d = dict(d)
        d["voxel_size"] = VoxelSize(*d["voxel_size"])
        d["grid_location"] = VoxelGridLocation(*d["grid_location"])
        return FeatureVoxelGridConfig(**d)


def init_mlp_params(
    key: jax.Array, in_dim: int, width: int, depth: int, out_dim: int
) -> MLPParams:
    """He-uniform kernels (torch nn.Linear default family), zero final bias
    (reference feature_voxels.py:126,140)."""
    dims = [in_dim] + [width] * (depth - 1) + [out_dim]
    params: MLPParams = []
    for i, (d_in, d_out) in enumerate(zip(dims[:-1], dims[1:])):
        key, k_kernel, k_bias = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(d_in)
        kernel = jax.random.uniform(k_kernel, (d_in, d_out), minval=-bound, maxval=bound)
        if i == len(dims) - 2:
            bias = jnp.zeros((d_out,))
        else:
            bias = jax.random.uniform(k_bias, (d_out,), minval=-bound, maxval=bound)
        params.append((kernel, bias))
    return params


def apply_mlp(params: MLPParams, x: jnp.ndarray) -> jnp.ndarray:
    """ReLU MLP over the trailing axis; hidden layers ReLU, final linear
    (reference feature_voxels.py:118-125)."""
    for i, (kernel, bias) in enumerate(params):
        x = x @ kernel + bias
        if i < len(params) - 1:
            x = jax.nn.relu(x)
    return x


@jax.tree_util.register_pytree_node_class
class FeatureVoxelGrid:
    """Immutable pytree: densities [X,Y,Z,1], features [X,Y,Z,F], MLP heads."""

    def __init__(
        self,
        densities: jnp.ndarray,
        features: jnp.ndarray,
        rgbnet: MLPParams,
        densitynet: MLPParams,
        config: FeatureVoxelGridConfig = FeatureVoxelGridConfig(),
    ):
        self.densities = densities
        self.features = features
        self.rgbnet = rgbnet
        self.densitynet = densitynet
        self.config = config

    # -- pytree protocol ------------------------------------------------------
    def tree_flatten(self):
        children = (self.densities, self.features, self.rgbnet, self.densitynet)
        return children, self.config

    @classmethod
    def tree_unflatten(cls, config, children):
        densities, features, rgbnet, densitynet = children
        return cls(densities, features, rgbnet, densitynet, config)

    # -- derived static properties -------------------------------------------
    @property
    def grid_dims(self) -> Tuple[int, int, int]:
        return tuple(self.features.shape[:3])

    @property
    def aabb(self) -> AxisAlignedBoundingBox:
        """World-space AABB (reference feature_voxels.py:216-241)."""
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

    def replace(self, **kwargs) -> "FeatureVoxelGrid":
        new = dict(
            densities=self.densities,
            features=self.features,
            rgbnet=self.rgbnet,
            densitynet=self.densitynet,
            config=self.config,
        )
        new.update(kwargs)
        return FeatureVoxelGrid(**new)


def create_feature_voxel_grid(
    key: jax.Array,
    grid_dims: Tuple[int, int, int],
    num_features: int,
    config: FeatureVoxelGridConfig = FeatureVoxelGridConfig(),
) -> FeatureVoxelGrid:
    """Uniform-random grid + fresh MLP heads (the reference leaves grid init
    to the caller; head init per feature_voxels.py:114-140)."""
    k_dens, k_feat, k_rgb, k_densnet = jax.random.split(key, 4)
    densities = jax.random.uniform(k_dens, (*grid_dims, 1))
    features = jax.random.uniform(k_feat, (*grid_dims, num_features), minval=-1.0, maxval=1.0)
    rgbnet = init_mlp_params(
        k_rgb, num_features, config.rgbnet_width, config.rgbnet_depth, 3
    )
    densitynet = init_mlp_params(
        k_densnet, 1, config.densitynet_width, config.densitynet_depth, 1
    )
    return FeatureVoxelGrid(densities, features, rgbnet, densitynet, config)


def feature_grid_query(grid: FeatureVoxelGrid, points: jnp.ndarray) -> jnp.ndarray:
    """Interpolated-and-decoded [rgb..., density] at world points [N, 3].

    Pipeline parity (reference feature_voxels.py:305-363): density
    pre-activation on raw * expected_density_scale BEFORE interpolation,
    post-activation AFTER; features pre-activated, interpolated, decoded by
    rgbnet, then post-activated. densitynet applies only when
    `use_densitynet` (the reference ships it commented out, :338).
    """
    cfg = grid.config
    normalized = _normalize_points(grid.aabb, points)

    d_pre = ACTIVATIONS[cfg.density_preactivation]
    d_post = ACTIVATIONS[cfg.density_postactivation]
    f_pre = ACTIVATIONS[cfg.feature_preactivation]
    f_post = ACTIVATIONS[cfg.feature_postactivation]

    pre_density = d_pre(grid.densities * cfg.expected_density_scale)
    pre_features = f_pre(grid.features)
    # one fused gather over the concatenated channels (same trick as
    # voxels.grid_query) — then one MXU matmul chain over the flat batch
    unified = jnp.concatenate([pre_features, pre_density], axis=-1)
    if cfg.gather_dtype == "bfloat16":
        unified = unified.astype(jnp.bfloat16)
    interpolated = trilinear_interpolate(unified, normalized).astype(jnp.float32)

    feats, dens = interpolated[..., :-1], interpolated[..., -1:]
    rgb = f_post(apply_mlp(grid.rgbnet, feats))
    if cfg.use_densitynet:
        dens = apply_mlp(grid.densitynet, dens)
    dens = d_post(dens)
    return jnp.concatenate([rgb, dens], axis=-1)


def scale_feature_voxel_grid(
    grid: FeatureVoxelGrid, output_size: Tuple[int, int, int]
) -> FeatureVoxelGrid:
    """Trilinear grid resample preserving the world AABB; MLP heads carry
    over unchanged (reference feature_voxels.py:366-407)."""
    unified = jnp.concatenate([grid.features, grid.densities], axis=-1)
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
    return FeatureVoxelGrid(
        densities=new_unified[..., num_feat:],
        features=new_unified[..., :num_feat],
        rgbnet=grid.rgbnet,
        densitynet=grid.densitynet,
        config=new_config,
    )


# ----------------------------------------------------------------------------------
# pickle-free checkpointing (npz + JSON meta, same container policy as
# models/volumetric.py; reference loaders: feature_voxels.py:410-417)
# ----------------------------------------------------------------------------------


def feature_grid_save_arrays(grid: FeatureVoxelGrid):
    """(arrays dict, meta dict) for an npz container."""
    import numpy as np

    arrays = {
        "fvg_densities": np.asarray(grid.densities),
        "fvg_features": np.asarray(grid.features),
    }
    for name, params in (("rgbnet", grid.rgbnet), ("densitynet", grid.densitynet)):
        for i, (kernel, bias) in enumerate(params):
            arrays[f"fvg_{name}_{i}_kernel"] = np.asarray(kernel)
            arrays[f"fvg_{name}_{i}_bias"] = np.asarray(bias)
    meta = {
        "config": grid.config.to_json_dict(),
        "rgbnet_layers": len(grid.rgbnet),
        "densitynet_layers": len(grid.densitynet),
    }
    return arrays, meta


def feature_grid_from_saved(arrays, meta) -> FeatureVoxelGrid:
    config = FeatureVoxelGridConfig.from_json_dict(meta["config"])

    def load_mlp(name: str, n: int) -> MLPParams:
        return [
            (
                jnp.asarray(arrays[f"fvg_{name}_{i}_kernel"]),
                jnp.asarray(arrays[f"fvg_{name}_{i}_bias"]),
            )
            for i in range(n)
        ]

    return FeatureVoxelGrid(
        densities=jnp.asarray(arrays["fvg_densities"]),
        features=jnp.asarray(arrays["fvg_features"]),
        rgbnet=load_mlp("rgbnet", meta["rgbnet_layers"]),
        densitynet=load_mlp("densitynet", meta["densitynet_layers"]),
        config=config,
    )
