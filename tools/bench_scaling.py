"""Multi-device scaling evidence on the 8-way virtual CPU mesh (VERDICT r2 #4).

Single-chip wall-clock speedups cannot be measured in this environment (one
physical TPU chip; the 8 virtual CPU devices share one core), so this tool
produces the three measurable pieces a scaling claim can rest on:

1. EXECUTED sharded-vs-unsharded step equivalence + timing on an 8-device
   virtual CPU mesh at a CPU-sized working set (structure actually runs).
2. An HLO COLLECTIVE AUDIT of the REAL dog2-shape edit step lowered with the
   8-way ray-DP sharding: every collective op, its shape, and its per-step
   ICI byte volume, extracted from the compiled module. No execution needed —
   this is the exact program a v4-8 would run.
3. A v4-8 time model from (2) + the measured single-chip component times:
   t(8) ~= max(compute/8, ici_bytes/ICI_BW) + fixed overhead.

Usage:  python tools/bench_scaling.py [--full-audit]
Writes a markdown table to stdout (pasted into BENCHMARKS.md "Scaling").
"""
from __future__ import annotations

import argparse
import os
import re
import sys
import time
from pathlib import Path

os.environ.setdefault("VOXE_PLATFORM", "cpu")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

DTYPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
               "f64": 8, "s8": 1, "u8": 1}


def collective_audit(compiled_text: str):
    """Parse collectives out of a compiled HLO module: op kind, shape, bytes."""
    rows = []
    pat = re.compile(
        r"(\w[\w.-]*) = ((?:\([^)]*\)|\S+)) (all-reduce|all-gather|"
        r"reduce-scatter|collective-permute|all-to-all)(?:-start)?\(",
    )
    for m in pat.finditer(compiled_text):
        shape_s, kind = m.group(2), m.group(3)
        total = 0
        for dt, dims in re.findall(r"(\w+)\[([\d,]*)\]", shape_s):
            if dt not in DTYPE_BYTES:
                continue
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            total += n * DTYPE_BYTES[dt]
        rows.append((kind, shape_s[:80], total))
    return rows


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--full-audit", action="store_true",
                   help="also lower+audit the REAL dog2-shape edit step "
                   "(slow CPU compile of the 1.3B-param program)")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.models.sd.config import tiny_test_config
    from voxe_tpu.parallel.mesh import make_mesh
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical
    from bench import make_dog2_grid

    assert len(jax.devices()) == 8, jax.devices()
    print(f"devices: 8x {jax.devices()[0].platform}")

    # ---- 1. executed sharded-vs-unsharded at CPU scale -------------------
    res, frame = 48, 64
    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=64, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
    )
    sd = StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)
    text = sd.get_text_embeds("a yarn dog", "")
    optimizer = optax.adam(0.03)
    pose = pose_spherical(30.0, 40.0, 4.0311)
    rot = jnp.asarray(pose.rotation)
    trans = jnp.asarray(pose.translation).reshape(3, 1)
    ref_d, ref_f = jnp.copy(grid.densities), jnp.copy(grid.features)

    results = {}
    hlo_small = {}
    for label, mesh in (("1-device", None), ("8-device mesh", make_mesh(8))):
        step = make_sds_train_step_shearwarp(
            sd, render_config, optimizer, (frame, frame),
            density_correlation_weight=200.0, mesh=mesh,
        )
        opt_state = optimizer.init(grid)
        g, s, m = step(grid, opt_state, sd.params, text, rot, trans,
                       ref_d, ref_f, jax.random.PRNGKey(0), jnp.asarray(50))
        jax.block_until_ready(g.densities)
        t0 = time.perf_counter()
        gg, ss = g, s
        for i in range(args.iters):
            gg, ss, m = step(gg, ss, sd.params, text, rot, trans,
                             ref_d, ref_f, jax.random.PRNGKey(0), jnp.asarray(50))
        jax.block_until_ready(gg.densities)
        results[label] = dict(
            ms=(time.perf_counter() - t0) / args.iters * 1e3,
            dens=np.asarray(gg.densities[:2, :2, :2, 0]),
        )
        lowered = jax.jit(step._fun if hasattr(step, "_fun") else step).lower(
            grid, opt_state, sd.params, text, rot, trans,
            ref_d, ref_f, jax.random.PRNGKey(0), jnp.asarray(50)
        )
        hlo_small[label] = lowered.compile().as_text()

    diff = float(np.max(np.abs(results["1-device"]["dens"]
                               - results["8-device mesh"]["dens"])))
    print("\n## executed on the 8-way virtual CPU mesh (tiny working set)\n")
    print("| config | step ms (1 shared CPU core) | grids equal |")
    print("|---|---|---|")
    for label, r in results.items():
        print(f"| {label} | {r['ms']:.1f} | max-diff {diff:.2e} |")

    print("\n## collectives in the executed 8-way program\n")
    rows = collective_audit(hlo_small["8-device mesh"])
    base_rows = collective_audit(hlo_small["1-device"])
    print(f"1-device program: {len(base_rows)} collectives (expected 0)")
    print("| op | shape | bytes/step |")
    print("|---|---|---|")
    for kind, shape, b in rows:
        print(f"| {kind} | `{shape}` | {b:,} |")
    total_small = sum(b for _, _, b in rows)
    print(f"total: {len(rows)} collectives, {total_small:,} bytes/step")

    # ---- 2. REAL dog2-shape program audit --------------------------------
    if args.full_audit:
        print("\n## collective audit: REAL dog2-shape edit step, 8-way ray-DP")
        sd_big = StableDiffusion(sd_version="2.0", init_mode="zeros")
        text_big = sd_big.get_text_embeds("a dog made of yarn, front view", "")
        grid_big = make_dog2_grid(160)
        rc_big = SHVoxGridRenderConfig(
            num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0),
            white_bkgd=True,
        )
        mesh = make_mesh(8)
        step = make_sds_train_step_shearwarp(
            sd_big, rc_big, optimizer, (400, 400),
            density_correlation_weight=200.0, mesh=mesh,
        )
        opt_big = optimizer.init(grid_big)
        t0 = time.perf_counter()
        lowered = jax.jit(
            step._fun if hasattr(step, "_fun") else step
        ).lower(
            grid_big, opt_big, sd_big.params, text_big, rot, trans,
            jnp.copy(grid_big.densities), jnp.copy(grid_big.features),
            jax.random.PRNGKey(0), jnp.asarray(500),
        )
        txt = lowered.compile().as_text()
        print(f"(CPU compile of the full program: {time.perf_counter()-t0:.0f}s)")
        rows = collective_audit(txt)
        agg = {}
        for kind, shape, b in rows:
            agg.setdefault(kind, [0, 0])
            agg[kind][0] += 1
            agg[kind][1] += b
        print("| op | count | bytes/step |")
        print("|---|---|---|")
        for kind, (c, b) in sorted(agg.items()):
            print(f"| {kind} | {c} | {b:,} |")
        total = sum(b for _, b in agg.values())
        print(f"total: {len(rows)} collectives, {total:,} bytes/step")
        # v4-8 model: ICI all-reduce effective BW ~ 100+ GB/s per link;
        # conservative 50 GB/s bisection for the ring all-reduce
        t_ici_ms = total / 50e9 * 1e3
        print(f"\nv4-8 model: ici time ~= {t_ici_ms:.2f} ms/step at 50 GB/s "
              "effective all-reduce bandwidth; compare BENCHMARKS.md "
              "single-chip component table.")


if __name__ == "__main__":
    main()
