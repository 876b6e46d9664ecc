from voxe_tpu.grid.voxels import (  # noqa: F401
    AxisAlignedBoundingBox,
    VoxelGrid,
    VoxelGridConfig,
    VoxelGridLocation,
    VoxelSize,
    grid_query,
    grid_query_attn,
    scale_voxel_grid,
    test_inside_volume,
)
