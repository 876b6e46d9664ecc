"""Visual + quantitative demo of the complete LOCALIZED edit pipeline with
analytic oracles — the strongest edit-quality evidence available where real
SD weights cannot enter (zero-egress image).

The reference's localized-edit recipe (edit_pretrained_relu_field.py:321-373
+ attn_grid_trainer.py:63-627) is: (A) a global SDS edit that may spill
outside the intended region, then (B) attention-grid refinement — learn
volumetric edit/object attention grids against SD cross-attention maps,
graph-cut them into an edit region, and merge: every non-edit voxel reverts
to the pre-edit grid. This demo runs that EXACT pipeline — the production
shear-warp SDS step, the production `make_dual_attn_update`, the native
graph cut, the production merge — substituting the two SD-dependent signals
with geometry-aware oracles:

  * stage A oracle: the analytic delta-target denoiser
    (tests/test_sds_oracle_edit.py) recolours the WHOLE object golden —
    deliberately spilling the edit over body + hat;
  * stage B oracle: per-pose edit/object target maps are rendered from the
    ground-truth hat/body masks through the SAME attn-mode shear-warp
    renderer the refinement loss uses — geometry-consistent stand-ins for
    SD's aggregated cross-attention maps (whose extraction is separately
    numerically validated against real transformers in
    tests/test_sd_weights_numeric.py).

Verifies, at any scale up to production (160^3):
  1. the graph cut recovers the GT hat region (IoU reported),
  2. the merge restores every non-edit voxel to the reference exactly,
  3. the hat keeps the stage-A edit (mean |feature delta| reported),
and writes before/global-edit/refined turntable frames side by side.

Run (CPU, ~2 min):   VOXE_PLATFORM=cpu python tools/demo_oracle_local_edit.py
Production (TPU):    python tools/demo_oracle_local_edit.py --res 160 \
    --base 256 --sds_iters 300 --refine_iters 300 --out docs/demo_oracle_local_160
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_hat_scene(res: int, world_size: float = 3.0):
    """Sphere body + cone 'hat' on top, distinct colours; returns
    (VoxelGrid, hat_mask [res,res,res] bool, body_mask)."""
    import jax.numpy as jnp
    import numpy as np

    from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize

    half = world_size / 2
    x = np.linspace(-half, half, res)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")

    body = np.sqrt(X**2 + Y**2 + (Z + 0.35) ** 2) < 0.8
    # cone apex up: radius shrinks with height above the body
    hz0, hz1 = 0.42, 1.15
    frac = np.clip((Z - hz0) / (hz1 - hz0), 0.0, 1.0)
    hat = (np.sqrt(X**2 + Y**2) < 0.55 * (1.0 - frac)) & (Z >= hz0) & (Z <= hz1)
    hat &= ~body

    density = np.where(body | hat, 40.0, -15.0).astype(np.float32)
    rgb = np.zeros((*X.shape, 3), dtype=np.float32)
    rgb[body] = (2.5, -1.5, -1.5)   # red body (pre-sigmoid logits)
    rgb[hat] = (-1.5, 2.5, -1.5)    # green hat

    config = VoxelGridConfig(
        voxel_size=VoxelSize(*([world_size / res] * 3)),
        density_preactivation="identity",
        density_postactivation="softplus",
        expected_density_scale=1.0,
    )
    grid = VoxelGrid(
        jnp.asarray(density[..., None]), jnp.asarray(rgb), config
    )
    return grid, hat, body


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--base", type=int, default=64)
    ap.add_argument("--sds_iters", type=int, default=250)
    ap.add_argument("--refine_iters", type=int, default=250)
    ap.add_argument("--eval_size", type=int, default=128)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).resolve().parent.parent
                                / "docs" / "demo_oracle_local"))
    args = ap.parse_args()
    OUT = Path(args.out)

    import imageio.v2 as imageio
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import orient_base_image, render_shear_warp
    from voxe_tpu.seg.graphcut import get_edit_region
    from voxe_tpu.train.refine import make_dual_attn_update
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp
    from voxe_tpu.utils.camera import (
        CameraBounds, CameraIntrinsics, CameraPose, pose_spherical, to8b,
    )

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_sds_oracle_edit import OracleSDS

    OUT.mkdir(parents=True, exist_ok=True)
    grid, hat_mask, body_mask = make_hat_scene(args.res)
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=96,
        camera_bounds=CameraBounds(0.5, 10.0),
        white_bkgd=True,
        perturb_sampled_points=False,
        render_num_samples_per_ray=128,
        parallel_rays_chunk_size=16384,
    )
    intr = CameraIntrinsics(args.eval_size, args.eval_size, float(args.eval_size))
    base_hw = (args.base, args.base)

    def frame(g, yaw):
        out = VolumetricModel(g, rcfg).render(intr, pose_spherical(yaw, 30.0, 4.031))
        return to8b(np.asarray(out.colour))

    before = frame(grid, 40.0)

    # ---------------- stage A: global oracle SDS edit (golden recolour,
    # deliberately unmasked within the object so it spills body + hat)
    target = (0.95, 0.75, 0.1)

    class MaskedOracle(OracleSDS):
        def sds_loss(self, params, text_embeddings, pred_rgb, key, t,
                     guidance_scale=100.0):
            x0 = jax.lax.stop_gradient(pred_rgb)
            is_obj = jnp.min(x0, axis=-1, keepdims=True) < 0.85
            x_star = jnp.where(is_obj, jnp.asarray(self.target), 1.0)
            abar = self.alphas[t]
            noise = jax.random.normal(key, pred_rgb.shape, pred_rgb.dtype)
            x_t = jnp.sqrt(abar) * x0 + jnp.sqrt(1.0 - abar) * noise
            eps_hat = (x_t - jnp.sqrt(abar) * x_star) / jnp.sqrt(1.0 - abar)
            grad = (1.0 - abar) * (eps_hat - noise)
            from voxe_tpu.models.sd.sds import specify_gradient

            return specify_gradient(pred_rgb, jnp.nan_to_num(grad))

    oracle = MaskedOracle(target)
    optimizer = optax.adam(0.05)
    opt_state = optimizer.init(grid)
    step = make_sds_train_step_shearwarp(
        oracle, rcfg, optimizer, base_hw, density_correlation_weight=5.0,
    )
    key = jax.random.PRNGKey(args.seed)
    rng = np.random.default_rng(args.seed)
    for i in range(args.sds_iters):
        key, k_t, k_step = jax.random.split(key, 3)
        pose = pose_spherical(
            float(rng.random() * 360.0), 15.0 + float(rng.random() * 60.0), 4.031
        )
        t = jax.random.randint(k_t, (), 20, 980)
        grid, opt_state, metrics = step(
            grid, opt_state, {}, jnp.zeros((2, 77, 8)),
            jnp.asarray(pose.rotation), jnp.asarray(pose.translation).reshape(3, 1),
            ref_d, ref_f, k_step, t,
        )
        if (i + 1) % 100 == 0:
            print(f"[sds] iter {i + 1}: loss {float(metrics['total_loss']):.4f}")
    edited = frame(grid, 40.0)

    # ---------------- stage B: oracle attention refinement.
    # Ground-truth target maps rendered from the GT masks through the SAME
    # attn-mode renderer the refinement loss uses.
    hat_attn = jnp.where(jnp.asarray(hat_mask)[..., None], 6.0, -20.0)
    body_attn = jnp.where(jnp.asarray(body_mask)[..., None], 6.0, -20.0)

    gt_attn2 = jnp.concatenate([hat_attn, body_attn], axis=-1)

    @jax.jit
    def oracle_maps(rotation, translation):
        pose = CameraPose(rotation=rotation, translation=translation)
        # both GT masks ride one 2-channel attn render, same as the
        # production dual update (train/refine.py make_dual_attn_update)
        aout, _ = render_shear_warp(
            grid.replace(attn=gt_attn2), pose, rcfg, base_hw=base_hw,
            attn_mode=True, background_value=0.0,
        )
        maps = orient_base_image(aout.colour.reshape(*base_hw, 2), rotation)
        return maps[..., 0], maps[..., 1]

    attn_opt = optax.adam(0.035)
    init_attn = jnp.full_like(grid.densities, -20.0)
    edit_attn, obj_attn = init_attn, init_attn
    opt_e = attn_opt.init(edit_attn)
    opt_o = attn_opt.init(obj_attn)
    update = jax.jit(
        make_dual_attn_update(rcfg, attn_opt, attn_opt, grid, base_hw,
                              attn_tv_weight=0.001)
    )
    for i in range(args.refine_iters):
        key, k1, k2 = jax.random.split(key, 3)
        pose = pose_spherical(
            float(rng.random() * 360.0), 15.0 + float(rng.random() * 60.0), 4.031
        )
        rot = jnp.asarray(pose.rotation)
        trans = jnp.asarray(pose.translation).reshape(3, 1)
        edit_map, obj_map = oracle_maps(rot, trans)
        edit_attn, obj_attn, opt_e, opt_o, metrics = update(
            edit_attn, obj_attn, opt_e, opt_o, rot, trans, edit_map, obj_map,
            k1, k2,
        )
        if (i + 1) % 100 == 0:
            print(f"[refine] iter {i + 1}: edit "
                  f"{float(metrics['attn_loss_edit']):.4f} obj "
                  f"{float(metrics['attn_loss_object']):.4f}")

    # ---------------- graph cut + merge (the production path)
    vm_edit = VolumetricModel(grid.replace(attn=edit_attn), rcfg)
    vm_obj = VolumetricModel(grid.replace(attn=obj_attn), rcfg)
    vm_out = VolumetricModel(grid.replace(attn=init_attn), rcfg)
    get_edit_region(
        vol_mod_edit=vm_edit, vol_mod_object=vm_obj, vol_mod_output=vm_out,
        K=5.0, num_obj_voxels_thresh=max(50, args.res**3 // 800),
        min_num_edit_voxels=30, top_k_edit_thresh=30, top_k_obj_thresh=20,
    )
    seg_edit = np.asarray(vm_out.grid.attn)[..., 0] == 0.0

    keep_mask = ~seg_edit
    new_d = np.asarray(grid.densities).copy()
    new_f = np.asarray(grid.features).copy()
    new_d[keep_mask] = np.asarray(ref_d)[keep_mask]
    new_f[keep_mask] = np.asarray(ref_f)[keep_mask]
    refined = grid.replace(
        densities=jnp.asarray(new_d), features=jnp.asarray(new_f)
    )
    after = frame(refined, 40.0)

    # ---------------- metrics
    # IoU over DENSE voxels: the graph includes a dilated one-voxel margin of
    # EMPTY voxels, and the diagonal-margin ones (26-neighborhood dilation,
    # 6-connected edges) have no arcs at all — free nodes, which the min-cut
    # labels edit/SOURCE by PyMaxflow's what_segment default (the reference
    # behaves identically, refinement_functions.py:293). They are empty, so
    # they never render; the meaningful segmentation-quality measure is over
    # voxels that exist.
    dense_mask = np.asarray(ref_d)[..., 0] > 0.0
    seg_edit_dense = seg_edit & dense_mask
    inter = float(np.sum(seg_edit_dense & hat_mask))
    union = float(np.sum(seg_edit_dense | hat_mask))
    iou = inter / max(union, 1.0)
    body_restored = np.array_equal(
        new_f[body_mask & keep_mask], np.asarray(ref_f)[body_mask & keep_mask]
    ) and np.array_equal(
        new_d[body_mask & keep_mask], np.asarray(ref_d)[body_mask & keep_mask]
    )
    hat_delta = float(
        np.mean(np.abs(new_f[hat_mask & seg_edit]
                       - np.asarray(ref_f)[hat_mask & seg_edit]))
    ) if np.any(hat_mask & seg_edit) else 0.0
    body_off = float(np.sum(body_mask & seg_edit)) / max(float(np.sum(body_mask)), 1)

    print(f"segmentation IoU vs GT hat region: {iou:.3f}")
    print(f"non-edit voxels restored exactly: {body_restored}")
    print(f"mean |feature delta| kept in hat: {hat_delta:.3f}")
    print(f"fraction of body voxels mislabeled edit: {body_off:.4f}")

    side = np.concatenate([before, edited, after], axis=1)
    imageio.imwrite(OUT / "before_globaledit_refined.png", side)
    for yaw in (0.0, 90.0, 180.0, 270.0):
        imageio.imwrite(OUT / f"refined_yaw{int(yaw):03d}.png",
                        frame(refined, yaw))
    print(f"wrote {OUT}/before_globaledit_refined.png")

    import json

    (OUT / "metrics.json").write_text(json.dumps(dict(
        iou=iou, body_restored=bool(body_restored), hat_feature_delta=hat_delta,
        body_mislabel_frac=body_off, res=args.res,
        sds_iters=args.sds_iters, refine_iters=args.refine_iters,
    ), indent=2))


if __name__ == "__main__":
    main()
