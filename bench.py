"""Benchmark: SDS edit-step latency — the flagship Vox-E workload.

Measures the fully-jitted edit iteration at the dog2 working set: a 160^3
softplus grid rendered to a 400^2 frame on the gather/scatter-free shear-warp
fast path (voxe_tpu/render/shearwarp.py), feeding a REAL-SHAPE SD 2.0 stack
(1.29B params, zero-valued weights - identical FLOPs to real weights):
resize->VAE-encode->2xUNet(bf16, CFG)->SDS-grad-inject, plus the volumetric
density-correlation loss and the Adam update. One program per dispatch, K
fused iterations per device call (the trainer's production dispatch; see
VOXE_BENCH_K below).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

`vs_baseline` compares against the reference's ONLY published performance
number: the global edit takes ~50 min for 8000 SDS iterations on an RTX A5000
(reference README.md:91-92), i.e. ~375 ms/iteration at the same working set
(400^2 dog2 frame, SD 2.0 at 512^2, CFG, guidance 100 - reference
thre3d_atom/thre3d_reprs/sd.py:191-215). vs_baseline = 375 / measured_ms.

Timing drains through a device->host fetch of the result bytes: on the axon
relay transport, block_until_ready returns before device execution completes
(BENCHMARKS.md "measurement truth"), so a fetch is the only hard barrier.
Each step consumes the previous step's grid/optimizer state - no dedupe or
overlap between iterations is possible.

Env knobs:
  VOXE_BENCH_MODE=edit|recon|refine|edit_real   (default edit - the headline)
  VOXE_BENCH_ITERS=N           (default 20 device dispatches)
  VOXE_BENCH_K=N               fused steps per dispatch in edit mode
                               (default 10 — the trainer's production
                               dispatch pattern; 1 = single-step program)
  VOXE_SHEARWARP=0             exact per-sample renderer instead (slow path)
  VOXE_BENCH_BASE=N            frame/base resolution (default 400)
"""
import json
import logging
import os
import sys
import time

# keep stdout to exactly one JSON line: route all logging to stderr
logging.basicConfig(stream=sys.stderr, level=logging.WARNING, force=True)

# reference README.md:91-92: ~50 min / 8000 iters on RTX A5000
REFERENCE_EDIT_MS_PER_ITER = 375.0
# recon mode: no published reference number exists; vs_baseline divides by
# the reference cost model at ~10 it/s x 32768 rays on A5000 (ESTIMATE) —
# deliberately generous to the reference so the recorded multiple is a floor.
# The MEASURED same-host anchor (VERDICT r3 weak-4): tools/bench_reference_cpu.py
# runs the reference's ACTUAL torch implementation at an identical working set
# on this host's CPU — 8192 rays / 322 ms = 25.4k rays/s (BASELINE.md,
# 2026-08-17). The recon JSON reports BOTH multipliers: `vs_baseline` keeps the
# conservative estimate-based divisor; `vs_baseline_measured_same_host` is
# traceable to that measurement (cross-hardware: torch-CPU vs one TPU chip,
# since the reference cannot run on TPU). A quality anchor also exists: at the
# reference's own 4x2000-iteration budget the framework reaches 38.76 dB
# held-out in 25.7 min end-to-end (BENCHMARKS.md "Full reference budget").
REFERENCE_RAYS_PER_SEC_EST = 0.33e6
REFERENCE_RAYS_PER_SEC_MEASURED_CPU = 8192.0 / 0.322  # = 25.4k rays/s


def make_dog2_grid(res: int = 160):
    """The canonical benchmark grid (dog2 working set): softplus field, bf16
    gather table, reference expected-density scale. Shared by the bisection/
    trace/edit-loop tools — change it HERE only."""
    import jax
    import jax.numpy as jnp  # noqa: F401

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
    from voxe_tpu.utils.misc import (
        compute_expected_density_scale_for_relu_field_grid,
    )

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    config = VoxelGridConfig(
        voxel_size=VoxelSize(*[3.0 / res] * 3),
        density_preactivation="identity",
        density_postactivation="softplus",
        gather_dtype="bfloat16",  # the TPU-native default (quality-neutral)
        expected_density_scale=compute_expected_density_scale_for_relu_field_grid(
            (3.0, 3.0, 3.0)
        ),
    )
    return VoxelGrid(
        densities=jax.random.uniform(k1, (res, res, res, 1), minval=-1.0, maxval=1.0),
        features=jax.random.uniform(k2, (res, res, res, 3), minval=-1.0, maxval=1.0),
        config=config,
    )


def _timed_graphcut_fixture(
    res: int,
    *,
    sphere_frac: float,
    edit_mask_thresh: float,
    num_obj_voxels_thresh: int,
    top_k_edit_thresh: int,
    top_k_obj_thresh: int,
):
    """Build the synthetic half-edit sphere fixture at res^3 and run ONE
    timed native BK graph cut (shared by the refine and edit_real modes so
    the two benches always measure the same cut workload shape).

    Returns (num_nodes, seconds)."""
    import numpy as np

    import voxe_tpu.seg.graphcut as gc

    idx = np.indices((res, res, res)).reshape(3, -1).T
    inside = (
        np.linalg.norm(idx - (res - 1) / 2.0, axis=1) < res * sphere_frac
    ).reshape(res, res, res, 1)
    dens = np.where(inside, 50.0, 0.0).astype(np.float32)  # post-activation
    # half the sphere leans edit, half object — a non-degenerate cut
    half = (idx[:, 0] < res // 2).reshape(res, res, res, 1)
    edit_logits = np.where(half, 3.0, -3.0).astype(np.float32)
    rng_np = np.random.default_rng(0)
    features = rng_np.random((res, res, res, 3), dtype=np.float32)
    t0 = time.perf_counter()
    gc.build_graph(
        features, dens, edit_logits, -edit_logits, K=5.0,
        edit_mask_thresh=edit_mask_thresh,
        num_obj_voxels_thresh=num_obj_voxels_thresh,
        min_num_edit_voxels=300,
        top_k_edit_thresh=top_k_edit_thresh,
        top_k_obj_thresh=top_k_obj_thresh,
        rng=rng_np,
    )
    return int(inside.sum()), time.perf_counter() - t0


def bench_edit(use_shearwarp: bool, iters: int, frame: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays
    from voxe_tpu.train.sds import (
        make_sds_train_step,
        make_sds_train_step_shearwarp,
    )
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

    # VOXE_BENCH_GRID / VOXE_BENCH_SD: CPU-sized smoke of this bench's
    # wiring (tests/test_bench_smoke.py); the headline stays 160^3 + SD 2.0
    grid = make_dog2_grid(int(os.environ.get("VOXE_BENCH_GRID", "160")))
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        # VOXE_FUSED_KERNEL=1 routes compositing through the Pallas kernel;
        # default OFF: measured 83.35 vs 53.27 ms/iter for the streamed
        # compositing (BENCHMARKS.md "Pallas compositing kernel" r4 re-test)
        use_fused_kernel=os.environ.get("VOXE_FUSED_KERNEL", "0") == "1",
    )
    sd = StableDiffusion(
        sd_version=os.environ.get("VOXE_BENCH_SD", "2.0"), init_mode="zeros"
    )
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)
    text = sd.get_text_embeds("a dog made of yarn, front view", "")
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    pose = pose_spherical(30.0, 40.0, 4.0311)
    key = jax.random.PRNGKey(1)
    t = jnp.asarray(500)

    K = int(os.environ.get("VOXE_BENCH_K", "10")) if use_shearwarp else 1
    if use_shearwarp and K > 1:
        # The trainer's own production dispatch: K fused steps per device
        # call (make_sds_train_multi_step — run_edit_loop_timed.py uses 25;
        # the in-scan hemisphere pose draw cycles marching branches exactly
        # like the real loop). The reference's 375 ms/iter anchor is itself
        # a loop-derived average (~50 min / 8000 iters, README.md:91-92),
        # so the fused rate is the apples-to-apples comparison; it matches
        # the measured 8000-iter sustained rate (48.0 ms/iter, BENCHMARKS
        # r4) where the single-dispatch program carries ~4 ms/iter of
        # per-dispatch framing. VOXE_BENCH_K=1 restores the single-step
        # program (the r2-r4 methodology).
        from voxe_tpu.train.sds import make_sds_train_multi_step

        multi = make_sds_train_multi_step(
            sd, render_config, optimizer,
            CameraIntrinsics(frame, frame, float(frame)), K,
            density_correlation_weight=200.0, use_shear_warp=True,
            sw_base_hw=(frame, frame),
        )
        text_by_dir = jnp.stack(
            [
                sd.get_text_embeds(f"a dog made of yarn, {d} view", "")
                for d in ("side", "overhead", "back", "front")
            ]
        )
        t_bounds = jnp.tile(jnp.asarray([[500, 500]], jnp.int32), (K, 1))

        g, s, m = multi(
            grid, opt_state, sd.params, text_by_dir, ref_d, ref_f, t_bounds, key
        )
        _ = np.asarray(g.densities.ravel()[:1])
        t0 = time.perf_counter()
        for i in range(iters):
            g, s, m = multi(
                g, s, sd.params, text_by_dir, ref_d, ref_f, t_bounds,
                jax.random.PRNGKey(i),
            )
        _ = np.asarray(g.densities.ravel()[:1])  # hard barrier
        elapsed = time.perf_counter() - t0
        ms = elapsed / (iters * K) * 1e3
        return {
            "metric": "sds_edit_step_ms",
            "value": round(ms, 2),
            "unit": "ms/iter",
            "vs_baseline": round(REFERENCE_EDIT_MS_PER_ITER / ms, 3),
        }

    if use_shearwarp:
        step = make_sds_train_step_shearwarp(
            sd, render_config, optimizer, (frame, frame),
            density_correlation_weight=200.0,
        )
        # cycle poses across different lax.switch marching branches, like the
        # production loop's random hemisphere draw — a single fixed pose
        # would time one branch only (ADVICE.md r2 #4)
        bench_poses = [
            pose_spherical(yaw, p, 4.0311)
            for yaw, p in ((30.0, 40.0), (120.0, 40.0), (210.0, 85.0), (300.0, 10.0))
        ]
        rots = [jnp.asarray(p.rotation) for p in bench_poses]
        transs = [jnp.asarray(p.translation).reshape(3, 1) for p in bench_poses]
        pose_i = [0]

        def args(g, s, k):
            i = pose_i[0] % len(bench_poses)
            pose_i[0] += 1
            return (
                g, s, sd.params, text, rots[i], transs[i], ref_d, ref_f, k, t,
            )
    else:
        step = make_sds_train_step(
            sd, render_config, optimizer, (frame, frame),
            density_correlation_weight=200.0,
        )
        rays = flatten_rays(
            cast_rays(
                CameraIntrinsics(frame, frame, float(frame)),
                jnp.asarray(pose.rotation),
                jnp.asarray(pose.translation),
            )
        )
        pixels = jnp.zeros((frame * frame, 3))
        args = lambda g, s, k: (  # noqa: E731
            g, s, sd.params, text, rays, pixels, ref_d, ref_f, k, t,
        )

    # warmup/compile; the fetch is the only hard barrier on this transport
    g, s, m = step(*args(grid, opt_state, key))
    _ = np.asarray(g.densities.ravel()[:1])

    t0 = time.perf_counter()
    for i in range(iters):
        g, s, m = step(*args(g, s, jax.random.PRNGKey(i)))
    _ = np.asarray(g.densities.ravel()[:1])  # hard barrier
    elapsed = time.perf_counter() - t0

    ms = elapsed / iters * 1e3
    return {
        "metric": "sds_edit_step_ms",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round(REFERENCE_EDIT_MS_PER_ITER / ms, 3),
    }


def bench_edit_real(iters: int, frame: int) -> dict:
    """SDS edit step at the REAL-SCENE production shape (VERDICT r4 next-1).

    Matches the reference's real-scene recipe
    (bash_scripts/real_scenes/edit_demo_real.sh:22-46 +
    train_default_relu_field_real.sh: 200^3 grid, dataset poses via
    data_pose_mode, density_correlation_weight 60000, 4000 iterations,
    --downsample_refine_grid for the cut) on the K-step fused dataset-pose
    dispatch (`make_sds_train_multi_step_data`, the trainer's own real-scene
    program; reference hot loop sds_trainer.py:244-267). Every previously
    published perf number was dog2-shaped; this exercises the paths dog2
    never touches — S=200 slice marching (non-lane-aligned volume dims),
    per-pose gathered rotations/translations in-scan, and the dir-bucketed
    text embeddings.

    The one-off DOWNSAMPLED graph cut (200^3 grid, x4 pooling — the
    --downsample_refine_grid flag the real recipe sets) is timed separately
    on stderr. vs_baseline reuses the 375 ms/iter dog2 edit anchor: the
    reference publishes no real-scene timing, and its real-scene iteration
    does strictly MORE work than its dog2 iteration (416 samples/ray at a
    200^3 grid vs 256 at 160^3) — the multiple is conservative.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import get_dir_batch_from_poses, DIR_TO_NUM_DICT
    from voxe_tpu.train.sds import make_sds_train_multi_step_data
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    res = int(os.environ.get("VOXE_BENCH_GRID", "200"))
    grid = make_dog2_grid(res)
    # VOXE_BENCH_SD=tiny: CPU-sized smoke of this bench's wiring (the full
    # SD 2.0 UNet never finishes a CPU compile); headline stays 2.0
    sd_version = os.environ.get("VOXE_BENCH_SD", "2.0")
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=416,  # the recipe's sampling budget (exact path;
        # shear-warp quadrature is the grid's own 200 slice planes)
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        linear_disparity_sampling=True,
    )
    sd = StableDiffusion(sd_version=sd_version, init_mode="zeros")
    optimizer = optax.adam(0.005)  # recipe learning_rate
    opt_state = optimizer.init(grid)
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)

    # a realistic posed capture: P dataset poses spread over the hemisphere
    P = 16
    rng = np.random.default_rng(0)
    poses_np = np.stack(
        [
            np.concatenate(
                [np.asarray(p.rotation), np.asarray(p.translation).reshape(3, 1)],
                axis=1,
            )
            for p in (
                pose_spherical(
                    float(rng.random() * 360.0),
                    15.0 + float(rng.random() * 70.0),
                    4.0311,
                )
                for _ in range(P)
            )
        ]
    )
    pose_rots = jnp.asarray(poses_np[:, :, :3])
    pose_transs = jnp.asarray(poses_np[:, :, 3:])
    dir_idx = jnp.asarray(
        [DIR_TO_NUM_DICT[d] for d in get_dir_batch_from_poses(poses_np)],
        dtype=jnp.int32,
    )
    prompt = "a photo of a pineapple on the ground in a backyard"
    text_by_dir = jnp.stack(
        [
            sd.get_text_embeds(prompt + f", {d} view", "")
            for d in ("side", "overhead", "back", "front")
        ]
    )

    K = int(os.environ.get("VOXE_BENCH_K", "10"))
    B = 1  # ray_batch 84672 // (im_h*im_w) -> 1 frame/step at real-scene dims
    step = make_sds_train_multi_step_data(
        sd, render_config, optimizer, (frame, frame), B, K,
        density_correlation_weight=60000.0,  # the recipe's dcl weight
    )
    # data_pose mode: volumetric losses only — dummy [1, ...] targets
    base_targets = jnp.zeros((1, frame, frame, 3))
    base_masks = jnp.zeros((1, frame, frame))
    t_bounds = jnp.tile(jnp.asarray([[20, 980]], jnp.int32), (K, 1))

    def one_call(g, s, key, i):
        k_idx, k_step = jax.random.split(key)
        pose_idx = jax.random.randint(k_idx, (K, B), 0, P)
        return step(
            g, s, sd.params, text_by_dir, pose_rots, pose_transs,
            base_targets, base_masks, dir_idx, pose_idx, ref_d, ref_f,
            t_bounds, k_step,
        )

    g, s, m = one_call(grid, opt_state, jax.random.PRNGKey(0), 0)
    _ = np.asarray(g.densities.ravel()[:1])
    g, s, m = one_call(g, s, jax.random.PRNGKey(10_000), 1)
    _ = np.asarray(g.densities.ravel()[:1])

    t0 = time.perf_counter()
    for i in range(iters):
        g, s, m = one_call(g, s, jax.random.PRNGKey(i), i)
    _ = np.asarray(g.densities.ravel()[:1])  # hard barrier
    ms = (time.perf_counter() - t0) / (iters * K) * 1e3
    print(
        f"edit_real: {iters} dispatches x {K} fused steps at {res}^3/"
        f"{frame}^2; projected 4000-iter recipe wall "
        f"{ms * 4000 / 60e3:.2f} min", file=sys.stderr,
    )

    # the recipe's one-off DOWNSAMPLED graph cut (--downsample_refine_grid):
    # x4 max-pool the 200^3 grid to 50^3 before BK maxflow
    d = res // 4
    nodes, cut_s = _timed_graphcut_fixture(
        d, sphere_frac=1.0 / 3.0, edit_mask_thresh=1.0,
        num_obj_voxels_thresh=40000, top_k_edit_thresh=290,
        top_k_obj_thresh=2500,
    )
    print(
        f"downsampled graphcut ({res}^3 -> {d}^3, {nodes} nodes): "
        f"{cut_s:.2f} s (one-off)", file=sys.stderr,
    )

    return {
        "metric": "sds_edit_real_step_ms",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round(REFERENCE_EDIT_MS_PER_ITER / ms, 3),
    }


def bench_recon(use_shearwarp: bool, iters: int, frame: int) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.recon import (
        make_recon_train_multi_step_shearwarp,
        make_recon_train_step,
        make_recon_train_step_shearwarp,
    )
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical

    grid = make_dog2_grid(int(os.environ.get("VOXE_BENCH_GRID", "160")))
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256,
        camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
        use_fused_kernel=os.environ.get("VOXE_FUSED_KERNEL", "0") == "1",
    )
    optimizer = optax.adam(0.03)
    opt_state = optimizer.init(grid)
    key = jax.random.PRNGKey(1)

    if use_shearwarp:
        import numpy as onp

        num_images = 8
        base_hw = (frame, frame)
        poses_np = []
        rng = onp.random.default_rng(0)
        for _ in range(num_images):
            p = pose_spherical(
                float(rng.random() * 360.0), 15.0 + float(rng.random() * 70.0), 4.0311
            )
            poses_np.append(
                onp.concatenate(
                    [onp.asarray(p.rotation), onp.asarray(p.translation).reshape(3, 1)],
                    axis=1,
                )
            )
        poses = jnp.asarray(onp.stack(poses_np))
        targets = jnp.zeros((num_images, *base_hw, 3))
        masks = jnp.ones((num_images, *base_hw))
        # K fused steps/dispatch — the trainer's production dispatch
        # (steps_per_call wires make_recon_train_multi_step_shearwarp);
        # VOXE_BENCH_K=1 restores the single-dispatch program
        K = int(os.environ.get("VOXE_BENCH_K", "10"))
        if K > 1:
            multi = make_recon_train_multi_step_shearwarp(
                render_config, optimizer, base_hw, K
            )
            rays_per_step = frame * frame * K

            def run(g, s, k, i):
                idxs = jnp.arange(i, i + K, dtype=jnp.int32) % num_images
                return multi(g, s, targets, masks, poses, idxs, k)

        else:
            step = make_recon_train_step_shearwarp(render_config, optimizer, base_hw)
            rays_per_step = frame * frame

            def run(g, s, k, i):
                return step(
                    g, s, targets, masks, poses, jnp.asarray(i % num_images), k
                )

    else:
        ray_batch = 32768
        image_size = 256
        num_images = 8
        intrinsics = CameraIntrinsics(image_size, image_size, float(image_size))
        step = make_recon_train_step(
            intrinsics, render_config, optimizer, ray_batch_size=ray_batch,
            donate=False,
        )
        images = jnp.zeros((num_images, image_size, image_size, 3))
        poses = (
            jnp.tile(jnp.eye(3, 4)[None], (num_images, 1, 1)).at[:, 2, 3].set(4.0)
        )
        batch_idx = jnp.arange(num_images)
        rays_per_step = ray_batch

        def run(g, s, k, i):
            return step(g, s, images, poses, batch_idx, k)

    g, s, m = run(grid, opt_state, key, 0)
    _ = np.asarray(g.densities.ravel()[:1])

    t0 = time.perf_counter()
    for i in range(iters):
        g, s, m = run(g, s, jax.random.PRNGKey(i), i)
    _ = np.asarray(g.densities.ravel()[:1])  # hard barrier
    elapsed = time.perf_counter() - t0

    rays_per_sec = rays_per_step * iters / elapsed
    return {
        "metric": "recon_train_rays_per_sec_per_chip",
        "value": round(rays_per_sec),
        "unit": "rays/s",
        # conservative: estimate-based divisor, generous to the reference
        "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC_EST, 3),
        # measured: reference torch step on this host's CPU at an identical
        # working set (tools/bench_reference_cpu.py, BASELINE.md)
        "vs_baseline_measured_same_host": round(
            rays_per_sec / REFERENCE_RAYS_PER_SEC_MEASURED_CPU, 3
        ),
        "baseline_sources": (
            "vs_baseline: ESTIMATE ~0.33M rays/s (A5000 cost model); "
            "vs_baseline_measured_same_host: MEASURED 25.4k rays/s "
            "(reference torch impl, this host CPU, tools/bench_reference_cpu.py)"
        ),
    }


def bench_refine(use_shearwarp: bool, iters: int, frame: int) -> dict:
    """One refinement iteration at production scale (VERDICT r2 next-3):
    no-grad RGB frame render + SD-1.4 attention-capture pass + the dual
    attn-grid jitted update, at 160^3 / frame^2 (reference cost model:
    attn_grid_trainer.py:238 — 1500 such iterations + one graph cut).

    The one-off native graph cut (160^3 grid, ~270k-node sphere) is timed
    separately and reported on stderr + BENCHMARKS.md; the JSON line carries
    the per-iteration cost. vs_baseline reuses the reference's EDIT-step
    anchor (375 ms/iter) because the reference publishes no refinement
    timing; its refine iteration does strictly LESS work than its edit
    iteration (1 UNet fwd, no CFG pair backward) — treat the multiple as a
    lower-bound-flavoured soft anchor (BENCHMARKS.md refinement table).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    res = int(os.environ.get("VOXE_BENCH_GRID", "160"))
    grid = make_dog2_grid(res)
    grid = grid.replace(attn=jnp.full((res, res, res, 1), -20.0))
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True,
    )
    # refinement uses SD 1.4 (reference attn_grid_trainer.py:154)
    sd = StableDiffusion(sd_version="1.4", init_mode="zeros")
    optimizer = optax.adam(0.035)
    edit_attn = grid.attn
    obj_attn = grid.attn
    opt_e = optimizer.init(edit_attn)
    opt_o = optimizer.init(obj_attn)
    pose = pose_spherical(30.0, 40.0, 4.0311)
    rot = jnp.asarray(pose.rotation)
    trans = jnp.asarray(pose.translation).reshape(3, 1)
    base_hw = (frame, frame)

    # the trainer's flagship refinement program: K fused iterations per
    # dispatch (steps_per_call). K=1 times the single fused iteration —
    # whose per-dispatch relay latency is exactly what the K-step scan
    # amortizes away (BENCHMARKS.md refinement table, "relay anomaly").
    K = int(os.environ.get("VOXE_BENCH_REFINE_K", "10"))
    prompt = "a render of a dog wearing a party hat"
    emask1 = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 0, 1], np.float32))  # "hat"

    if K > 1:
        from voxe_tpu.train.refine import make_refine_multi_step

        multi = make_refine_multi_step(
            sd, render_config, optimizer, optimizer, grid, base_hw,
            timestamp=200, attn_tv_weight=0.001, steps_per_call=K,
            radius=4.0311,
        )
        dirs = ("side", "overhead", "back", "front")
        text_by_dir = jnp.stack(
            [sd.get_text_embeds(prompt + f", {d} view", "") for d in dirs]
        )
        idxs = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (4, 1))
        emask = jnp.tile(emask1[None], (4, 1))
        omask = 1.0 - emask

        def one_call(e_attn, o_attn, oe, oo, key):
            e, o, oe2, oo2, _ = multi(
                e_attn, o_attn, oe, oo, sd.params, text_by_dir,
                idxs, emask, omask, key,
            )
            return e, o, oe2, oo2

    else:
        from voxe_tpu.train.refine import make_refine_iter_shearwarp

        refine_iter = make_refine_iter_shearwarp(
            sd, render_config, optimizer, optimizer, grid, base_hw,
            timestamp=200, attn_tv_weight=0.001,
        )
        text = sd.get_text_embeds(prompt + ", front view", "")
        idxs = jnp.arange(1, 9, dtype=jnp.int32)
        emask = emask1
        omask = 1.0 - emask

        def one_call(e_attn, o_attn, oe, oo, key):
            e, o, oe2, oo2, _ = refine_iter(
                e_attn, o_attn, oe, oo, sd.params, text, rot, trans,
                idxs, emask, omask, key,
            )
            return e, o, oe2, oo2

    # two warmup dispatches with fetch barriers: the first pays compile, the
    # second drains the relay's post-compile settling (~30 s observed once
    # after a cold compile; steady state follows from dispatch 3 on)
    e, o, oe, oo = one_call(edit_attn, obj_attn, opt_e, opt_o, jax.random.PRNGKey(0))
    _ = np.asarray(e.ravel()[:1])
    e, o, oe, oo = one_call(e, o, oe, oo, jax.random.PRNGKey(10_000))
    _ = np.asarray(e.ravel()[:1])

    t0 = time.perf_counter()
    for i in range(iters):
        e, o, oe, oo = one_call(e, o, oe, oo, jax.random.PRNGKey(i))
    _ = np.asarray(e.ravel()[:1])
    ms = (time.perf_counter() - t0) / (iters * K) * 1e3
    print(f"refine: {iters} dispatches x {K} fused steps", file=sys.stderr)

    # one-off native graph cut at production voxel count (sphere r=res/4
    # voxels: ~270k non-empty nodes at 160^3)
    nodes, cut_s = _timed_graphcut_fixture(
        res, sphere_frac=0.25, edit_mask_thresh=0.992,
        num_obj_voxels_thresh=5000, top_k_edit_thresh=300,
        top_k_obj_thresh=200,
    )
    print(
        f"graphcut({res}^3, {nodes} nodes): {cut_s:.2f} s "
        f"(one-off per refinement)", file=sys.stderr,
    )

    return {
        "metric": "refine_step_ms",
        "value": round(ms, 2),
        "unit": "ms/iter",
        "vs_baseline": round(REFERENCE_EDIT_MS_PER_ITER / ms, 3),
    }


def main() -> None:
    # persistent compilation cache: makes the benchmark robust to slow/flaky
    # remote-compile services - any prior successful compile is reused. CPU
    # smokes skip it (XLA:CPU AOT entries must never pollute the TPU cache;
    # rationale in voxe_tpu/utils/compile_cache.py).
    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    mode = os.environ.get("VOXE_BENCH_MODE", "edit")
    use_shearwarp = os.environ.get("VOXE_SHEARWARP", "1") == "1"
    iters = int(os.environ.get("VOXE_BENCH_ITERS", "20"))
    frame_env = os.environ.get("VOXE_BENCH_BASE")
    if frame_env:
        frame = int(frame_env)  # explicit override: exact, like the trainers
    elif use_shearwarp:
        # mirror the trainers' default: the dog2 scene is 400^2, and the
        # shear-warp trainers round the internal base lattice to the nearest
        # lane-aligned multiple of 128 (400 -> 384; lane_aligned_res docstring)
        from voxe_tpu.render.shearwarp import lane_aligned_res

        frame = lane_aligned_res(400)
    else:
        frame = 400

    if mode == "recon":
        result = bench_recon(use_shearwarp, iters, frame if use_shearwarp else 400)
    elif mode == "refine":
        result = bench_refine(use_shearwarp, iters, frame)
    elif mode == "edit_real":
        result = bench_edit_real(iters, frame)
    else:
        result = bench_edit(use_shearwarp, iters, frame)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
