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
from voxe_tpu.grid.feature_voxels import (  # noqa: F401
    FeatureVoxelGrid,
    FeatureVoxelGridConfig,
    create_feature_voxel_grid,
    feature_grid_query,
    scale_feature_voxel_grid,
)
