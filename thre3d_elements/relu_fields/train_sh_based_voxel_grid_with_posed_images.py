"""Legacy CLI snapshot: reconstruct an SH voxel grid (relu_fields-era defaults).

Rebuild of the reference's stale legacy copy (reference:
thre3d_elements/relu_fields/train_sh_based_voxel_grid_with_posed_images.py:38-266),
which differs from the live CLI only in defaults — 128^3 grid, sh_degree 2,
ray_batch_size 16384, data_downsample_factor 2.0 — and in predating
linear-disparity/optimized sampling and the LPIPS loss weight. Implemented
as a thin variant of the modern command (no second pipeline copy).
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from _legacy import MODERN_DEFAULT, load_modern_cli, make_legacy_command

_modern = load_modern_cli("train_sh_based_voxel_grid_with_posed_images")

main = make_legacy_command(
    _modern.main,
    name="train_sh_based_voxel_grid_with_posed_images",
    help_text=(
        "Legacy (relu_fields-era) reconstruction CLI: 128^3 grid, SH degree 2, "
        "16384-ray batches, 2x input downsampling."
    ),
    default_overrides={
        # reference legacy file lines 51-92: the four defaults that diverge.
        "data_downsample_factor": 2.0,
        "grid_dims": (128, 128, 128),
        "sh_degree": 2,
        "ray_batch_size": 16384,
    },
    pinned={
        # post-legacy reference flags, at their pre-existence behaviour:
        "linear_disparity_sampling": False,
        "optimized_sampling": False,
        "lpips_weight": 0.0,
        # voxe_tpu extras (absent from every reference CLI):
        "coarse_stages_on_cpu": MODERN_DEFAULT,
        "gather_dtype": MODERN_DEFAULT,
        "multihost": MODERN_DEFAULT,
        "num_devices": MODERN_DEFAULT,
        "resume_from": MODERN_DEFAULT,
        "shear_warp_base_res": MODERN_DEFAULT,
        "steps_per_call": MODERN_DEFAULT,
        "use_fused_kernel": MODERN_DEFAULT,
        "use_shear_warp": MODERN_DEFAULT,
    },
)


if __name__ == "__main__":
    main()
