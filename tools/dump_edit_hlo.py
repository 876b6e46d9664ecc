"""AOT-compile the SDS edit step on the TPU backend and analyze its HLO.

Prints op histograms, while-loop counts, remat markers, fusion sizes, and the
compiled memory analysis — the evidence base for the composed-step pathology
(see BENCHMARKS.md "Edit-loop cost").
"""
from __future__ import annotations

import argparse
import collections
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--image", type=int, default=400)
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--samples", type=int, default=256)
    p.add_argument("--sd_version", type=str, default="2.0")
    p.add_argument("--remat_render", action="store_true")
    p.add_argument("--remat_sds", action="store_true")
    p.add_argument("--out", type=str, default="/tmp/edit_step_hlo.txt")
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.rays import cast_rays, flatten_rays
    from voxe_tpu.train.sds import make_sds_train_step
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics

    res, im = args.grid, args.image
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=args.samples,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
    )
    sd = StableDiffusion(sd_version=args.sd_version, init_mode="zeros")
    text = sd.get_text_embeds("a dog made of yarn", "")
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(grid)
    intr = CameraIntrinsics(im, im, float(im))
    rays = flatten_rays(
        cast_rays(intr, jnp.eye(3), jnp.array([[0.0], [0.0], [4.0]]))
    )
    pixels = jnp.zeros((im * im, 3))
    ref_d, ref_f = jnp.copy(grid.densities), jnp.copy(grid.features)

    step = make_sds_train_step(
        sd, render_config, optimizer, (im, im),
        density_correlation_weight=200.0, tv_density_weight=0.1,
        remat_render=args.remat_render, remat_sds=args.remat_sds,
    )
    t0 = time.time()
    lowered = step.lower(
        grid, opt_state, sd.params, text, rays, pixels, ref_d, ref_f,
        jax.random.PRNGKey(1), jnp.asarray(500),
    )
    print(f"lowered in {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    compiled = lowered.compile()
    print(f"compiled in {time.time() - t0:.1f}s", flush=True)

    try:
        mem = compiled.memory_analysis()
        print(
            f"memory: output={getattr(mem, 'output_size_in_bytes', '?')} "
            f"temp={getattr(mem, 'temp_size_in_bytes', '?')} "
            f"argument={getattr(mem, 'argument_size_in_bytes', '?')} "
            f"generated={getattr(mem, 'generated_code_size_in_bytes', '?')}"
        )
    except Exception as e:  # pragma: no cover
        print(f"memory_analysis unavailable: {e}")

    hlo = compiled.as_text()
    Path(args.out).write_text(hlo)
    print(f"HLO: {len(hlo)} bytes -> {args.out}")

    ops = collections.Counter(
        m.group(1) for m in re.finditer(r"= \S+ ([a-z][a-z0-9-]*)\(", hlo)
    )
    print("top ops:", ops.most_common(20))
    print("while loops:", ops.get("while", 0))
    print("remat markers:", len(re.findall(r"remat", hlo)))
    # biggest tensors mentioned
    shapes = collections.Counter(
        m.group(0) for m in re.finditer(r"f32\[[0-9,]{8,}\]|bf16\[[0-9,]{8,}\]", hlo)
    )
    big = sorted(
        shapes,
        key=lambda s: -eval(s[s.index("[") + 1 : -1].replace(",", "*") or "0"),
    )[:10]
    print("largest shapes:", big)


if __name__ == "__main__":
    main()
