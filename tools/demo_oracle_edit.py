"""Visual demo of the SDS edit loop with the analytic oracle denoiser.

Real SD weights cannot enter this environment (zero egress), so this demo
substitutes the exact noise predictor of a delta target distribution (see
tests/test_sds_oracle_edit.py for the math) and runs the REAL shear-warp
edit train step — proving the whole chain (differentiable render -> SDS
gradient injection -> DCL geometry anchor -> Adam) produces a visible,
geometry-preserving edit. Writes before/after turntable frames and a
side-by-side PNG into docs/demo_oracle/.

Run (CPU, ~2 min):  VOXE_PLATFORM=cpu python tools/demo_oracle_edit.py
Production scale (TPU): python tools/demo_oracle_edit.py --res 160 --base 256 \
    --out docs/demo_oracle_160
"""
from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=32)
    ap.add_argument("--base", type=int, default=64)
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--eval_size", type=int, default=128)
    ap.add_argument("--out", type=str,
                    default=str(Path(__file__).resolve().parent.parent
                                / "docs" / "demo_oracle"))
    args = ap.parse_args()
    OUT = Path(args.out)
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.data.synthetic import make_demo_grid
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.train.sds import make_sds_train_step_shearwarp
    from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical, to8b

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tests"))
    from test_sds_oracle_edit import OracleSDS

    import imageio.v2 as imageio

    OUT.mkdir(parents=True, exist_ok=True)
    grid = make_demo_grid(res=args.res)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=96,
        camera_bounds=CameraBounds(0.5, 10.0),
        white_bkgd=True,
        perturb_sampled_points=False,
        render_num_samples_per_ray=128,
        parallel_rays_chunk_size=16384,
    )
    intr = CameraIntrinsics(args.eval_size, args.eval_size, float(args.eval_size))
    target = (0.95, 0.75, 0.1)  # "make it golden"

    class MaskedOracle(OracleSDS):
        """Target = golden on object pixels, white on background — the
        delta-target analog of a prompt that describes the OBJECT (a real SD
        score doesn't push empty space toward the prompt colour; an
        unmasked constant target does, hazing the background)."""

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
        oracle, rcfg, optimizer, (args.base, args.base), density_correlation_weight=5.0,
    )
    ref_d = jnp.copy(grid.densities)
    ref_f = jnp.copy(grid.features)

    def frame(g, yaw):
        out = VolumetricModel(g, rcfg).render(intr, pose_spherical(yaw, 30.0, 4.031))
        return to8b(np.asarray(out.colour))

    before = frame(grid, 40.0)
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    for i in range(args.iters):
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
        if (i + 1) % 50 == 0:
            print(f"iter {i + 1}: total_loss {float(metrics['total_loss']):.4f} "
                  f"dcl {float(metrics['density_correlation_loss']):.5f}")
    after = frame(grid, 40.0)

    side = np.concatenate([before, after], axis=1)
    imageio.imwrite(OUT / "before_after.png", side)

    # small turntable of the edited grid
    frames = [frame(grid, yaw) for yaw in np.linspace(0, 360, 13)[:-1]]
    from voxe_tpu.viz.video import write_video

    write_video(OUT / "edited_turntable.mp4", frames, fps=6)
    print(f"wrote {OUT}/before_after.png and edited_turntable.mp4")

    corr = np.corrcoef(
        np.asarray(ref_d).ravel(), np.asarray(grid.densities).ravel()
    )[0, 1]
    print(f"density correlation with pre-edit grid: {corr:.3f}")


if __name__ == "__main__":
    main()
