"""End-to-end timed LOCAL edit: 8000 SDS iterations + 1500 attn-grid
refinement iterations + the one-off native graph cut — the reference's
complete localized-edit recipe (edit_pretrained_relu_field.py:109-114 +
attn_grid_trainer.py:238: the refinement stage runs after the SDS stage
whenever do_refinement is set), at dog2 production scale on real SD shapes
with zero weights (identical FLOPs; real weights cannot enter this
zero-egress image).

Reports wall-clock per phase and total. The reference publishes ~50 min for
the SDS stage alone (README.md:91-92) and no refinement timing.

Run:  python tools/run_local_edit_timed.py
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--sds_iters", type=int, default=8000)
    p.add_argument("--refine_iters", type=int, default=1500)
    p.add_argument("--sds_steps_per_call", type=int, default=25)
    # K=10 measured 163.8 ms/iter sustained where the per-dispatch relay
    # overhead was ~1.2 s (device time ~55 ms/iter by component bisection);
    # K=50 amortizes that overhead 5x deeper for the same compiled scan body
    p.add_argument("--refine_steps_per_call", type=int, default=50)
    p.add_argument("--frame", type=int, default=400)
    p.add_argument("--grid", type=int, default=160)
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.models.sd.sds import DIRECTION_PROMPTS
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import make_sds_train_multi_step
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics

    print(f"devices: {jax.devices()}")
    res, frame = args.grid, args.frame
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )

    def fetch(x):
        return np.asarray(x.ravel()[:1])

    key = jax.random.PRNGKey(7)
    t_total = time.perf_counter()

    # ---------------- phase A: 8000-iteration SDS edit (SD 2.0 shapes) ----
    t0 = time.perf_counter()
    sd = StableDiffusion(
        sd_version="2.0", init_mode="zeros",
        t_sched_start=4000, t_sched_freq=600, t_sched_gamma=0.75,
    )
    print(f"sd2.0 build: {time.perf_counter() - t0:.1f}s")
    text_by_dir = jnp.stack(
        [
            sd.get_text_embeds(f"a dog made of yarn, {d} view", "")
            for d in DIRECTION_PROMPTS
        ]
    )
    optimizer = optax.adam(0.01)
    opt_state = optimizer.init(grid)
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    intrinsics = CameraIntrinsics(frame, frame, float(frame))
    K = args.sds_steps_per_call
    multi = make_sds_train_multi_step(
        sd, render_config, optimizer, intrinsics, K,
        density_correlation_weight=200.0, use_shear_warp=True,
    )
    t_sds = time.perf_counter()
    done = 0
    while done < args.sds_iters:
        bounds = []
        for gs in range(done + 1, done + K + 1):
            sd.update_t_schedule(min(gs, args.sds_iters))
            bounds.append(
                (
                    int(sd.num_train_timesteps * sd.min_step_ratio),
                    int(sd.num_train_timesteps * sd.max_step_ratio),
                )
            )
        key, k_step = jax.random.split(key)
        grid, opt_state, metrics = multi(
            grid, opt_state, sd.params, text_by_dir, ref_d, ref_f,
            jnp.asarray(bounds, jnp.int32), k_step,
        )
        if done == 0:
            fetch(grid.densities)
            t_steady = time.perf_counter()
            print(f"  sds compile+first chunk: {t_steady - t_sds:.1f}s")
        done += K
        # periodic drain: unbounded dispatch queues trip the relay's
        # session-bimodal enqueue pathology (BENCHMARKS.md "Relay anomaly");
        # the loop tool drains every 1000 iters and measures stable
        if done % 1000 < K:
            fetch(grid.densities)
        if done % 2000 < K:
            print(f"  sds iter {done} ({time.perf_counter() - t_sds:.0f}s)")
    fetch(grid.densities)
    sds_s = time.perf_counter() - t_sds
    sds_steady = time.perf_counter() - t_steady
    print(f"  sds steady-state (excl. compile+first chunk): "
          f"{sds_steady / max(args.sds_iters - K, 1) * 1e3:.1f} ms/iter")
    del sd, multi, opt_state, text_by_dir
    print(f"PHASE sds: {args.sds_iters} iters in {sds_s / 60:.2f} min "
          f"({sds_s / args.sds_iters * 1e3:.1f} ms/iter)")

    # ------------- phase B: 1500-iteration refinement (SD 1.4 shapes) -----
    # program identical to bench.py's VOXE_BENCH_MODE=refine K>1 path so the
    # persistent compile cache is shared
    from voxe_tpu.train.refine import make_refine_multi_step

    t0 = time.perf_counter()
    sd14 = StableDiffusion(sd_version="1.4", init_mode="zeros")
    print(f"sd1.4 build: {time.perf_counter() - t0:.1f}s")
    grid = grid.replace(attn=jnp.full((res, res, res, 1), -20.0))
    optimizer = optax.adam(0.035)
    edit_attn = grid.attn
    obj_attn = grid.attn
    opt_e = optimizer.init(edit_attn)
    opt_o = optimizer.init(obj_attn)
    RK = args.refine_steps_per_call
    prompt = "a render of a dog wearing a party hat"
    multi_r = make_refine_multi_step(
        sd14, render_config, optimizer, optimizer, grid, (frame, frame),
        timestamp=200, attn_tv_weight=0.001, steps_per_call=RK, radius=4.0311,
    )
    dirs = ("side", "overhead", "back", "front")
    text_by_dir = jnp.stack(
        [sd14.get_text_embeds(prompt + f", {d} view", "") for d in dirs]
    )
    idxs = jnp.tile(jnp.arange(1, 9, dtype=jnp.int32)[None], (4, 1))
    emask = jnp.tile(
        jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 0, 1], np.float32))[None], (4, 1)
    )
    omask = 1.0 - emask

    t_ref = time.perf_counter()
    done = 0
    while done < args.refine_iters:
        key, k_step = jax.random.split(key)
        edit_attn, obj_attn, opt_e, opt_o, _ = multi_r(
            edit_attn, obj_attn, opt_e, opt_o, sd14.params,
            text_by_dir, idxs, emask, omask, k_step,
        )
        if done == 0:
            fetch(edit_attn)
            t_rsteady = time.perf_counter()
            print(f"  refine compile+first chunk: {time.perf_counter() - t_ref:.1f}s")
        done += RK
        if done % 500 < RK:
            fetch(edit_attn)
            print(f"  refine iter {done} ({time.perf_counter() - t_ref:.0f}s)")
    fetch(edit_attn)
    refine_s = time.perf_counter() - t_ref
    refine_steady = time.perf_counter() - t_rsteady
    print(f"PHASE refine: {args.refine_iters} iters in {refine_s / 60:.2f} min "
          f"({refine_s / args.refine_iters * 1e3:.1f} ms/iter; steady "
          f"{refine_steady / max(args.refine_iters - RK, 1) * 1e3:.1f} ms/iter)")

    # ---------------- phase C: one-off native graph cut -------------------
    import voxe_tpu.seg.graphcut as gc

    # zero-weight SD leaves both the densities and the attn logits unshaped
    # (softplus of a random field is positive EVERYWHERE -> a degenerate
    # 4.1M-node graph; measured once: 159 s, a scaling datapoint, not a
    # production cost). Real trained scenes occupy ~5-7% of the volume, so
    # model the object as bench.py's refine-mode sphere (r = res/4 -> ~270k
    # nodes) and overlay non-degenerate half/half labels for the cut.
    idx3 = np.indices((res, res, res)).reshape(3, -1).T
    inside = (np.linalg.norm(idx3 - (res - 1) / 2.0, axis=1) < res / 4.0).reshape(
        res, res, res, 1
    )
    post_d = np.where(inside, np.asarray(jax.nn.softplus(grid.densities)), 0.0)
    post_d = post_d.astype(np.float32)
    half = (idx3[:, 0] < res // 2).reshape(res, res, res, 1)
    edit_logits = np.where(half, 3.0, -3.0).astype(np.float32)
    t_cut = time.perf_counter()
    segments, _ = gc.build_graph(
        np.asarray(grid.features), post_d, edit_logits, -edit_logits, K=5.0,
        edit_mask_thresh=0.992, num_obj_voxels_thresh=5000,
        min_num_edit_voxels=300, top_k_edit_thresh=300, top_k_obj_thresh=200,
        rng=np.random.default_rng(0),
    )
    cut_s = time.perf_counter() - t_cut
    print(f"PHASE graphcut: {cut_s:.2f} s")

    total = time.perf_counter() - t_total
    print(
        f"RESULT: local edit end-to-end ({args.sds_iters} SDS + "
        f"{args.refine_iters} refine + graph cut) = {total / 60:.2f} min wall "
        f"| sds {sds_s / 60:.2f} min | refine {refine_s / 60:.2f} min | "
        f"cut {cut_s:.1f} s | reference SDS stage alone ~50 min (A5000)"
    )


if __name__ == "__main__":
    main()
