"""Trilinear interpolation of a dense voxel grid at continuous points.

Semantics match `torch.nn.functional.grid_sample(..., align_corners=False,
padding_mode="zeros")` as used by the reference voxel grid
(reference: thre3d_atom/thre3d_reprs/voxels.py:306-332), but with the axis
convention already untangled: `grid[x, y, z, channel]` is interpolated with
`points[:, 0] -> x`, `points[:, 1] -> y`, `points[:, 2] -> z` (the reference
achieves the same pairing through a permute into torch's z,y,x layout).

TPU notes: the 8-corner fetch is expressed as a single flat `jnp.take`
(fast-path gather on TPU) followed by a weighted reduction; gradients flow
through `take`'s transpose (scatter-add) which XLA lowers natively, so no
custom VJP is needed for correctness. The op is fully shape-static and safe
under jit/shard_map.
"""
import jax.numpy as jnp


def trilinear_interpolate(grid: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Interpolate `grid` at normalized `points`.

    Args:
        grid: [X, Y, Z, C] voxel vertex values.
        points: [N, 3] coordinates in [-1, 1] per axis (values outside the
            range contribute zeros, matching padding_mode="zeros").
    Returns:
        [N, C] interpolated values.
    """
    X, Y, Z, C = grid.shape
    sizes = jnp.array([X, Y, Z], dtype=points.dtype)

    # align_corners=False un-normalization: voxel centers at i + 0.5
    coords = ((points + 1.0) * sizes - 1.0) * 0.5  # [N, 3]
    base = jnp.floor(coords)
    frac = coords - base
    base = base.astype(jnp.int32)

    flat_grid = grid.reshape(-1, C)

    # accumulate in float32 even for low-precision grids (bf16 gather mode)
    out = jnp.zeros((points.shape[0], C), dtype=jnp.float32)
    for dx in (0, 1):
        wx = (1.0 - frac[:, 0]) if dx == 0 else frac[:, 0]
        ix = base[:, 0] + dx
        vx = (ix >= 0) & (ix < X)
        ixc = jnp.clip(ix, 0, X - 1)
        for dy in (0, 1):
            wy = (1.0 - frac[:, 1]) if dy == 0 else frac[:, 1]
            iy = base[:, 1] + dy
            vy = (iy >= 0) & (iy < Y)
            iyc = jnp.clip(iy, 0, Y - 1)
            for dz in (0, 1):
                wz = (1.0 - frac[:, 2]) if dz == 0 else frac[:, 2]
                iz = base[:, 2] + dz
                vz = (iz >= 0) & (iz < Z)
                izc = jnp.clip(iz, 0, Z - 1)

                weight = wx * wy * wz
                weight = jnp.where(vx & vy & vz, weight, 0.0)
                flat_idx = (ixc * Y + iyc) * Z + izc
                corner = jnp.take(flat_grid, flat_idx, axis=0)
                out = out + weight.astype(jnp.float32)[:, None] * corner.astype(
                    jnp.float32
                )
    return out.astype(grid.dtype if grid.dtype != jnp.bfloat16 else jnp.float32)
