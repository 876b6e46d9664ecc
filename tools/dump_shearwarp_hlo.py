"""AOT-compile the SHEAR-WARP SDS edit step (the bench.py headline program)
and dump its optimized HLO for fusion-level attribution.

The trace report (tools/trace_report.py) names hot ops `fusion.NNNN`; this
dump lets those names be grepped back to their HLO bodies (op mix, shapes,
source metadata) so optimization decisions target the right computation.

Usage:
  python tools/dump_shearwarp_hlo.py [--frame 400 --grid 160]
  grep -n "fusion.6217 " /tmp/shearwarp_edit_hlo.txt
"""
from __future__ import annotations

import argparse
import collections
import math
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    # Mirror bench.py's env knobs so the dump corresponds (and cache-hits)
    # to a benchmark run made with the same settings.
    p.add_argument(
        "--frame", type=int, default=int(os.environ.get("VOXE_BENCH_BASE", "400"))
    )
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--sd_version", type=str, default="2.0")
    p.add_argument("--out", type=str, default="/tmp/shearwarp_edit_hlo.txt")
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    res, frame = args.grid, args.frame
    from bench import make_dog2_grid

    # EXACTLY bench.py's construction so the persistent compile cache hits
    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        use_fused_kernel=os.environ.get("VOXE_FUSED_KERNEL", "0") == "1",
    )
    sd = StableDiffusion(sd_version=args.sd_version, init_mode="zeros")
    text = sd.get_text_embeds("a dog made of yarn, front view", "")
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)
    ref_d, ref_f = jnp.copy(grid.densities), jnp.copy(grid.features)
    pose = pose_spherical(30.0, 40.0, 4.0311)
    rot = jnp.asarray(pose.rotation)
    trans = jnp.asarray(pose.translation).reshape(3, 1)

    step = make_sds_train_step_shearwarp(
        sd, render_config, optimizer, (frame, frame),
        density_correlation_weight=200.0,
    )
    t0 = time.time()
    lowered = step.lower(
        grid, opt_state, sd.params, text, rot, trans, ref_d, ref_f,
        jax.random.PRNGKey(1), jnp.asarray(500),
    )
    print(f"lowered in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)

    hlo = compiled.as_text()
    Path(args.out).write_text(hlo)
    print(f"HLO: {len(hlo)} bytes -> {args.out}")

    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= \S+ ([a-z][a-z0-9-]*)\(", hlo)
    )
    print("top ops:", ops.most_common(15))
    shapes = collections.Counter(
        m.group(0) for m in re.finditer(r"f32\[[0-9,]{8,}\]|bf16\[[0-9,]{8,}\]", hlo)
    )
    def _numel(s: str) -> int:
        dims = s[s.index("[") + 1 : -1]
        return math.prod(int(d) for d in dims.split(",") if d)

    big = sorted(shapes, key=lambda s: -_numel(s))[:10]
    print("largest shapes:", big)


if __name__ == "__main__":
    main()
