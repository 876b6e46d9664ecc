"""Legacy CLI snapshot: render a turntable/spiral video (relu_fields-era).

Rebuild of the reference's stale legacy copy (reference:
thre3d_elements/relu_fields/render_sh_based_voxel_grid.py:28-120), which
predates the dataset camera path, the --ref_path camera-metadata override,
per-frame PNG saving, and prompt.txt output. One knowing divergence: the
modern callback forces a white background for rendering (as the live
reference CLI does at render_sh_based_voxel_grid.py:97-98); the legacy
snapshot rendered with whatever background the checkpoint carried.
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent))

from _legacy import MODERN_DEFAULT, load_modern_cli, make_legacy_command

_modern = load_modern_cli("render_sh_based_voxel_grid")

main = make_legacy_command(
    _modern.main,
    name="render_sh_based_voxel_grid",
    help_text=(
        "Legacy (relu_fields-era) turntable/spiral render CLI: no dataset "
        "camera path, no ref-model metadata override, video output only."
    ),
    default_overrides={},
    pinned={
        # post-legacy reference flags, at their pre-existence behaviour:
        "ref_path": None,
        "data_path": None,
        "save_freq": None,
        "sds_prompt": None,
        # voxe_tpu extras:
        "use_shear_warp": MODERN_DEFAULT,
    },
    type_overrides={
        # legacy choice set (reference legacy :40): no "dataset" path.
        "camera_path": click.Choice(["thre360", "spiral"]),
    },
)


if __name__ == "__main__":
    main()
