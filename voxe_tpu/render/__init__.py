from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays, collate_rays  # noqa: F401
from voxe_tpu.render.interface import (  # noqa: F401
    RenderOut,
    SHVoxGridRenderConfig,
    render_sh_voxel_grid,
    render_sh_voxel_grid_attn,
)
