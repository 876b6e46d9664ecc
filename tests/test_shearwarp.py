"""Shear-warp renderer: parity vs the exact per-sample renderer + gradients.

The shear-warp base image is compared against the exact renderer evaluated
along the SAME rays (origin = eye, directions = the base pixels' unit dirs),
so the two integrate the identical continuous field with different
quadratures (slice-aligned vs uniform-t). Agreement is statistical, not
bitwise.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.data.synthetic import make_demo_grid
from voxe_tpu.render.interface import SHVoxGridRenderConfig, render_sh_voxel_grid
from voxe_tpu.render.rays import Rays
from voxe_tpu.render.shearwarp import render_shear_warp, screen_to_base
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics, pose_spherical


@pytest.fixture(scope="module")
def grid():
    return make_demo_grid(res=48)


@pytest.fixture(scope="module")
def rcfg():
    return SHVoxGridRenderConfig(
        num_samples_per_ray=192,
        camera_bounds=CameraBounds(0.5, 10.0),
        white_bkgd=True,
        perturb_sampled_points=False,
    )


@pytest.mark.parametrize(
    "yaw,pitch",
    [(40.0, 30.0), (130.0, 20.0), (220.0, 45.0), (310.0, 10.0), (0.0, 85.0)],
)
def test_parity_with_exact_renderer(grid, rcfg, yaw, pitch):
    pose = pose_spherical(yaw, pitch, 4.0)
    base_hw = (96, 96)
    out, geom = render_shear_warp(grid, pose, rcfg, base_hw=base_hw)
    sw_img = np.asarray(out.colour).reshape(*base_hw, 3)

    exact = render_sh_voxel_grid(
        grid,
        Rays(
            origins=jnp.broadcast_to(geom.eye, geom.dirs.shape),
            directions=geom.dirs,
        ),
        rcfg,
    )
    ex_img = np.asarray(exact.colour).reshape(*base_hw, 3)

    assert np.isfinite(sw_img).all()
    mse = float(np.mean((sw_img - ex_img) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 22.0, f"shear-warp vs exact parity too low: {psnr:.2f} dB"
    # the images must actually contain the object, not just white background
    assert sw_img.min() < 0.7


def test_all_six_branches_execute(grid, rcfg):
    """Poses down every axis (both signs) pick all 6 marching branches."""
    seen = set()
    for yaw, pitch in [
        (0.0, 0.0), (90.0, 0.0), (180.0, 0.0), (270.0, 0.0),
        (0.0, 89.0), (0.0, -89.0),
    ]:
        pose = pose_spherical(yaw, pitch, 4.0)
        out, geom = render_shear_warp(grid, pose, rcfg, base_hw=(32, 32))
        assert np.isfinite(np.asarray(out.colour)).all()
        seen.add(int(geom.perm_index))
    assert len(seen) >= 3, seen  # axis-aligned poses cover >= 3 branches


def test_gradients_flow_and_are_finite(grid, rcfg):
    pose = pose_spherical(30.0, 40.0, 4.0)

    def loss_fn(g):
        out, _ = render_shear_warp(g, pose, rcfg, base_hw=(48, 48))
        return jnp.mean((out.colour - 0.2) ** 2)

    grads = jax.grad(
        lambda d, f: loss_fn(grid.replace(densities=d, features=f))
    )(grid.densities, grid.features)
    for gleaf in grads:
        arr = np.asarray(gleaf)
        assert np.isfinite(arr).all()
        assert np.abs(arr).max() > 0.0


def test_no_gather_scatter_in_training_hlo(grid, rcfg):
    """The whole point: the compiled train-direction program contains no
    gather or scatter ops."""
    pose = pose_spherical(30.0, 40.0, 4.0)

    @jax.jit
    def step(d, f):
        def loss_fn(d_, f_):
            out, _ = render_shear_warp(
                grid.replace(densities=d_, features=f_), pose, rcfg,
                base_hw=(32, 32),
            )
            return jnp.mean(out.colour)

        return jax.grad(loss_fn, argnums=(0, 1))(d, f)

    import re

    hlo = step.lower(grid.densities, grid.features).compile().as_text()
    # match actual scatter/gather HLO ops, not metadata strings like the CPU
    # target feature "+prefer-no-scatter"
    ops = re.findall(r"= \S+ (scatter|gather)[.\d]*\(", hlo)
    assert not ops, f"gather/scatter leaked into the shear-warp program: {ops}"


@pytest.mark.parametrize(
    "yaw,pitch",
    [(0.0, 10.0), (90.0, 10.0), (180.0, 10.0), (0.0, 85.0)],
)
def test_sh_degree1_parity_across_branches(rcfg, yaw, pitch):
    """View-dependent (sh_degree 1) radiance must match the exact renderer on
    EVERY marching branch: SH coefficients are world-frame, so the shear-warp
    path has to evaluate SH with world-ordered view directions (regression:
    canonical-permuted components silently corrupted non-z branches)."""
    import jax

    base = make_demo_grid(res=32)
    key = jax.random.PRNGKey(9)
    feats = jnp.concatenate(
        [base.features, 0.5 * jax.random.normal(key, (32, 32, 32, 9))], axis=-1
    )  # [.., 12] = 3 channels x 4 coeffs (degree 1)
    g1 = base.replace(features=feats)

    pose = pose_spherical(yaw, pitch, 4.0)
    out, geom = render_shear_warp(g1, pose, rcfg, base_hw=(64, 64))
    exact = render_sh_voxel_grid(
        g1,
        Rays(
            origins=jnp.broadcast_to(geom.eye, geom.dirs.shape),
            directions=geom.dirs,
        ),
        rcfg,
    )
    a = np.asarray(out.colour)
    b = np.asarray(exact.colour)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 22.0, f"deg-1 parity on branch {int(geom.perm_index)}: {psnr:.2f} dB"


def test_non_cubic_grid(rcfg):
    """Non-cubic grids must render on every branch (regression: per-branch
    t_slices shapes crashed lax.switch for unequal grid dims)."""
    import dataclasses

    import jax

    from voxe_tpu.grid.voxels import VoxelGrid

    base = make_demo_grid(res=32)
    key = jax.random.PRNGKey(2)
    k1, k2 = jax.random.split(key)
    cfg = dataclasses.replace(base.config)
    g = VoxelGrid(
        densities=jax.random.uniform(k1, (16, 24, 32, 1), minval=-5.0, maxval=5.0),
        features=jax.random.uniform(k2, (16, 24, 32, 3), minval=-1.0, maxval=1.0),
        config=cfg,
    )
    for yaw, pitch in [(0.0, 10.0), (90.0, 10.0), (0.0, 85.0)]:
        out, geom = render_shear_warp(
            g, pose_spherical(yaw, pitch, 4.0), rcfg, base_hw=(32, 32)
        )
        img = np.asarray(out.colour)
        assert np.isfinite(img).all()
        exact = render_sh_voxel_grid(
            g,
            Rays(
                origins=jnp.broadcast_to(geom.eye, geom.dirs.shape),
                directions=geom.dirs,
            ),
            rcfg,
        )
        mse = float(np.mean((img - np.asarray(exact.colour)) ** 2))
        psnr = -10.0 * np.log10(mse + 1e-12)
        assert psnr > 20.0, f"non-cubic parity ({yaw},{pitch}): {psnr:.2f} dB"


def _blob_row_cols(img):
    """(green blob centroid, red blob centroid) as (row, col) pairs."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    green = (g > r + 0.05) & (g > b + 0.05)
    red = (r > g + 0.05) & (r > b + 0.05)
    assert green.sum() > 30 and red.sum() > 30, (green.sum(), red.sum())
    rows = np.arange(img.shape[0])[:, None]
    cols = np.arange(img.shape[1])[None, :]

    def centroid(m):
        return (
            float((rows * m).sum() / m.sum()),
            float((cols * m).sum() / m.sum()),
        )

    return centroid(green), centroid(red)


@pytest.mark.parametrize("yaw,pitch", [(0.0, 15.0), (45.0, 50.0), (90.0, 60.0),
                                       (180.0, 15.0), (270.0, 70.0)])
def test_orient_base_image_matches_screen_layout(grid, rcfg, yaw, pitch):
    """The ORIENTED base frame (what SD consumes) must show the scene's
    blobs in the same relative arrangement as the exact screen render from
    the same pose (regression: raw base frames are mirrored/rotated on
    non-z marching branches)."""
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.shearwarp import orient_base_image
    from voxe_tpu.utils.camera import CameraIntrinsics

    pose = pose_spherical(yaw, pitch, 4.0)
    out, _ = render_shear_warp(grid, pose, rcfg, base_hw=(96, 96))
    base = np.asarray(
        orient_base_image(
            out.colour.reshape(96, 96, 3), jnp.asarray(pose.rotation)
        )
    )
    screen = np.asarray(
        VolumetricModel(grid, rcfg)
        .render(CameraIntrinsics(96, 96, 96.0), pose)
        .colour
    ).reshape(96, 96, 3)

    (g_b, r_b) = _blob_row_cols(base)
    (g_s, r_s) = _blob_row_cols(screen)
    # green-to-red displacement must point the same way in both frames
    dv_b = np.array(r_b) - np.array(g_b)
    dv_s = np.array(r_s) - np.array(g_s)
    cos = float(
        (dv_b @ dv_s) / (np.linalg.norm(dv_b) * np.linalg.norm(dv_s) + 1e-9)
    )
    assert cos > 0.7, (yaw, pitch, dv_b, dv_s, cos)


def test_attn_mode_parity_with_exact_attn_renderer(grid, rcfg):
    """Shear-warp attn render vs the exact attn renderer along the same rays
    (black background, grid_query_attn semantics)."""
    import jax

    from voxe_tpu.render.interface import render_sh_voxel_grid_attn

    key = jax.random.PRNGKey(5)
    attn = jax.random.uniform(key, (*grid.grid_dims, 1), minval=-8.0, maxval=2.0)
    agrid = grid.replace(attn=attn)
    pose = pose_spherical(70.0, 25.0, 4.0)
    base_hw = (64, 64)
    out, geom = render_shear_warp(
        agrid, pose, rcfg, base_hw=base_hw, attn_mode=True, background_value=0.0
    )
    exact = render_sh_voxel_grid_attn(
        agrid,
        Rays(
            origins=jnp.broadcast_to(geom.eye, geom.dirs.shape),
            directions=geom.dirs,
        ),
        rcfg,
    )
    a = np.asarray(out.colour).reshape(-1)
    b = np.asarray(exact.colour).reshape(-1)
    assert np.isfinite(a).all()
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 22.0, f"attn shear-warp vs exact parity too low: {psnr:.2f} dB"


def test_bf16_grid_matches_f32(grid, rcfg):
    """gather_dtype=bfloat16 routes the resample einsums through the bf16 MXU
    path (f32 accumulation); the image stays within bf16 quantization of the
    f32 render."""
    import dataclasses

    bf_grid = grid.replace(
        config=dataclasses.replace(grid.config, gather_dtype="bfloat16")
    )
    pose = pose_spherical(40.0, 30.0, 4.0)
    out32, _ = render_shear_warp(grid, pose, rcfg, base_hw=(64, 64))
    out16, _ = render_shear_warp(bf_grid, pose, rcfg, base_hw=(64, 64))
    a, b = np.asarray(out32.colour), np.asarray(out16.colour)
    mse = float(np.mean((a - b) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 35.0, f"bf16 shear-warp diverges from f32: {psnr:.2f} dB"


def test_screen_to_base_roundtrip(grid, rcfg):
    """Screen rays through the base plane land inside the base window."""
    pose = pose_spherical(50.0, 35.0, 4.0)
    base_hw = (64, 64)
    _, geom = render_shear_warp(grid, pose, rcfg, base_hw=base_hw)
    intr = CameraIntrinsics(32, 32, 32.0)
    coords = np.asarray(screen_to_base(pose, intr, geom, grid, base_hw))
    assert coords.shape == (32, 32, 2)
    # the central screen pixel looks at the object => lands inside the window
    c = coords[16, 16]
    assert 0.0 <= c[0] <= base_hw[0] - 1.0
    assert 0.0 <= c[1] <= base_hw[1] - 1.0


@pytest.mark.parametrize("yaw,pitch", [(70.0, 25.0), (200.0, 40.0)])
def test_multichannel_attn_render_matches_per_channel(grid, rcfg, yaw, pitch):
    """A [X,Y,Z,2] attn volume rendered in ONE attn-mode pass must equal the
    two single-channel renders exactly — the fused dual edit/object update
    (train/refine.py make_dual_attn_update) relies on this channel
    independence."""
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    a1 = jax.random.uniform(k1, (*grid.grid_dims, 1), minval=-8.0, maxval=2.0)
    a2 = jax.random.uniform(k2, (*grid.grid_dims, 1), minval=-8.0, maxval=2.0)
    pose = pose_spherical(yaw, pitch, 4.0)
    base_hw = (48, 48)

    both, _ = render_shear_warp(
        grid.replace(attn=jnp.concatenate([a1, a2], axis=-1)), pose, rcfg,
        base_hw=base_hw, attn_mode=True, background_value=0.0,
    )
    for i, a in enumerate((a1, a2)):
        single, _ = render_shear_warp(
            grid.replace(attn=a), pose, rcfg,
            base_hw=base_hw, attn_mode=True, background_value=0.0,
        )
        np.testing.assert_allclose(
            np.asarray(both.colour[..., i]),
            np.asarray(single.colour[..., 0]),
            atol=1e-6, rtol=1e-6,
        )


@pytest.mark.parametrize("yaw,pitch", [(40.0, 30.0), (220.0, 45.0)])
def test_screen_space_render_matches_exact(grid, rcfg, yaw, pitch):
    """The full factorization (base composite + final 2D warp,
    render_shear_warp_to_screen) reproduces the EXACT screen-space renderer
    statistically, and fills true background pixels exactly."""
    from voxe_tpu.render.rays import cast_rays, flatten_rays
    from voxe_tpu.render.shearwarp import render_shear_warp_to_screen

    intr = CameraIntrinsics(64, 64, 64.0)
    pose = pose_spherical(yaw, pitch, 4.0)

    fast = render_shear_warp_to_screen(grid, pose, intr, rcfg)
    assert fast.colour.shape == (64, 64, 3)
    assert fast.depth.shape == (64, 64, 1)
    fast_img = np.asarray(fast.colour)

    exact = render_sh_voxel_grid(
        grid,
        flatten_rays(
            cast_rays(
                intr,
                jnp.asarray(pose.rotation),
                jnp.asarray(pose.translation),
            )
        ),
        rcfg,
    )
    ex_img = np.asarray(exact.colour).reshape(64, 64, 3)

    assert np.isfinite(fast_img).all()
    mse = float(np.mean((fast_img - ex_img) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 26.0, f"screen-space fast render too far off: {psnr:.2f} dB"
    # the object is visible, and pure-background pixels are exactly white
    assert fast_img.min() < 0.7
    bg = ex_img[0, 0]
    np.testing.assert_allclose(fast_img[0, 0], bg, atol=1e-3)


def test_facade_render_use_shear_warp(grid, rcfg):
    """VolumetricModel.render(use_shear_warp=True) returns [H, W, C] leaves
    for both the RGB and attn paths (the render CLIs' --use_shear_warp)."""
    from voxe_tpu.models.volumetric import VolumetricModel

    intr = CameraIntrinsics(32, 48, 40.0)  # non-square screen
    pose = pose_spherical(75.0, 20.0, 4.0)
    attn = jnp.where(grid.densities > 0.0, 4.0, -20.0)
    vm = VolumetricModel(grid.replace(attn=attn), rcfg)

    out = vm.render(intr, pose, use_shear_warp=True, shear_warp_base_res=96)
    assert out.colour.shape == (32, 48, 3)
    assert np.isfinite(np.asarray(out.colour)).all()

    out_attn = vm.render(intr, pose, attn=True, use_shear_warp=True)
    assert out_attn.colour.shape == (32, 48, 1)
    a = np.asarray(out_attn.colour)
    assert np.isfinite(a).all()
    assert a.max() > 0.5  # the attn region renders
    np.testing.assert_allclose(a[0, 0, 0], 0.0, atol=1e-4)  # black bg


def test_screen_space_diffuse_matches_exact(grid, rcfg):
    """render_diffuse=True on the fast screen path reproduces the exact
    renderer's diffuse (degree-0) render statistically — the trainer
    feedback PNGs' diffuse panel uses this override."""
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.rays import cast_rays, flatten_rays

    intr = CameraIntrinsics(64, 64, 64.0)
    pose = pose_spherical(40.0, 30.0, 4.0)
    vm = VolumetricModel(grid, rcfg)

    fast = np.asarray(
        vm.render(intr, pose, use_shear_warp=True, render_diffuse=True).colour
    )
    exact = np.asarray(
        render_sh_voxel_grid(
            grid,
            flatten_rays(
                cast_rays(
                    intr,
                    jnp.asarray(pose.rotation),
                    jnp.asarray(pose.translation),
                )
            ),
            rcfg.replace(render_diffuse=True),
        ).colour
    ).reshape(64, 64, 3)

    mse = float(np.mean((fast - exact) ** 2))
    psnr = -10.0 * np.log10(mse + 1e-12)
    assert psnr > 26.0, f"diffuse fast render off: {psnr:.2f} dB"


def test_camera_path_fast_matches_per_frame(grid, rcfg):
    """render_camera_path_fast (one dispatch, uint8 on device) reproduces
    the per-frame fast renders through to8b exactly."""
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.utils.camera import get_thre360_animation_poses, to8b

    intr = CameraIntrinsics(32, 32, 32.0)
    vm = VolumetricModel(grid, rcfg)
    poses = get_thre360_animation_poses(
        hemispherical_radius=4.0, camera_pitch=60.0, num_poses=3
    )
    stacked = vm.render_camera_path_fast(intr, poses)
    assert stacked.shape == (len(poses), 32, 32, 3)
    assert stacked.dtype == np.uint8
    for i, pose in enumerate(poses):
        single = to8b(
            np.asarray(vm.render(intr, pose, use_shear_warp=True).colour)
        )
        # identical math modulo uint8 rounding at clip boundaries
        assert np.mean(np.abs(stacked[i].astype(int) - single.astype(int))) < 0.5
        assert np.max(np.abs(stacked[i].astype(int) - single.astype(int))) <= 1


def test_camera_path_fast_attn_matches_per_frame(grid, rcfg):
    """render_camera_path_fast_attn (one dispatch) reproduces the per-pose
    facade fast renders (rgb, attn channel, attn acc) within uint8 rounding."""
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.utils.camera import get_thre360_animation_poses
    from voxe_tpu.utils.constants import EXTRA_ACCUMULATED_WEIGHTS

    intr = CameraIntrinsics(32, 32, 32.0)
    vm = VolumetricModel(
        grid.replace(attn=jnp.where(grid.densities > 0.0, 4.0, -20.0)), rcfg
    )
    poses = get_thre360_animation_poses(
        hemispherical_radius=4.0, camera_pitch=60.0, num_poses=3
    )
    rgb_u8, attn_u8, acc_u8 = vm.render_camera_path_fast_attn(intr, poses)
    assert rgb_u8.shape == (len(poses), 32, 32, 3)
    assert attn_u8.shape == acc_u8.shape == (len(poses), 32, 32)

    to8 = lambda x: (255.0 * np.clip(np.asarray(x), 0.0, 1.0)).astype(np.uint8)
    for i, pose in enumerate(poses):
        rgb = to8(vm.render(intr, pose, use_shear_warp=True).colour)
        out_a = vm.render(intr, pose, attn=True, use_shear_warp=True)
        attn = to8(out_a.colour[..., 0])
        acc = to8(out_a.extra[EXTRA_ACCUMULATED_WEIGHTS][..., 0])
        for fused, single in ((rgb_u8[i], rgb), (attn_u8[i], attn), (acc_u8[i], acc)):
            assert np.max(np.abs(fused.astype(int) - single.astype(int))) <= 1


def test_density_noise_streamed_matches_monolithic(grid, rcfg):
    """config.stochastic_density_noise_std on the shear-warp fast path:
    streamed and monolithic composites must agree under noise (same key ->
    same [N, S] draw). Regression for the outside-window radiance leak: with
    noise active, masked density no longer forces zero weights outside the
    base window, so the streamed shade must zero those colour contributions
    exactly like the monolithic path's -INFINITY radiance mask."""
    pose = pose_spherical(40.0, 30.0, 4.0)
    base_hw = (64, 64)
    cfg_noise = rcfg.replace(stochastic_density_noise_std=1.0)
    key = jax.random.PRNGKey(3)

    out_s, _ = render_shear_warp(
        grid, pose, cfg_noise, base_hw=base_hw, key=key, stream_composite=True
    )
    out_m, _ = render_shear_warp(
        grid, pose, cfg_noise, base_hw=base_hw, key=key, stream_composite=False
    )
    np.testing.assert_allclose(
        np.asarray(out_s.colour), np.asarray(out_m.colour), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_s.extra["accumulated_weight"]),
        np.asarray(out_m.extra["accumulated_weight"]),
        atol=5e-3,
    )

    # noise actually perturbs the render (the knob is live), and zero std
    # reproduces the deterministic image
    out_0, _ = render_shear_warp(grid, pose, rcfg, base_hw=base_hw, key=key)
    assert not np.allclose(np.asarray(out_s.colour), np.asarray(out_0.colour))
    out_0b, _ = render_shear_warp(grid, pose, rcfg, base_hw=base_hw, key=key)
    np.testing.assert_array_equal(
        np.asarray(out_0.colour), np.asarray(out_0b.colour)
    )


def test_unibranch_matches_static_six_way(grid, rcfg, monkeypatch):
    """The cubic-grid single-trace path (traced axis permutation + traced
    flip_k; VERDICT r4 next-3) must reproduce the 6-way static-branch path
    — every flip/permutation fold is value-preserving arithmetic (0/1
    permutation matmuls, float negation, tril/triu select), so the tolerance
    is tight (f32 reassociation ulps only), across all six orientations."""
    base_hw = (48, 48)
    for yaw, pitch in [
        (0.0, 0.0), (90.0, 0.0), (180.0, 0.0), (270.0, 0.0),
        (0.0, 89.0), (0.0, -89.0), (40.0, 30.0), (220.0, 45.0),
    ]:
        pose = pose_spherical(yaw, pitch, 4.0)
        monkeypatch.setenv("VOXE_SW_UNIBRANCH", "1")
        out_u, geom_u = render_shear_warp(grid, pose, rcfg, base_hw=base_hw)
        monkeypatch.setenv("VOXE_SW_UNIBRANCH", "0")
        out_s, geom_s = render_shear_warp(grid, pose, rcfg, base_hw=base_hw)
        assert int(geom_u.perm_index) == int(geom_s.perm_index)
        np.testing.assert_allclose(
            np.asarray(out_u.colour), np.asarray(out_s.colour),
            atol=1e-4, err_msg=f"pose ({yaw}, {pitch})",
        )
        np.testing.assert_allclose(
            np.asarray(out_u.depth), np.asarray(out_s.depth), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(geom_u.lo), np.asarray(geom_s.lo), atol=1e-5
        )


def test_unibranch_gradients_match_static(grid, rcfg, monkeypatch):
    """Gradients through the single-trace path == the static path's (the
    training consumers differentiate through the render)."""
    pose = pose_spherical(220.0, 45.0, 4.0)  # a negative-direction branch

    def loss(densities, features):
        g = grid.replace(densities=densities, features=features)
        out, _ = render_shear_warp(g, pose, rcfg, base_hw=(32, 32))
        return jnp.sum(out.colour ** 2)

    grads = {}
    for flag in ("1", "0"):
        monkeypatch.setenv("VOXE_SW_UNIBRANCH", flag)
        grads[flag] = jax.grad(loss, argnums=(0, 1))(
            grid.densities, grid.features
        )
    for gu, gs in zip(grads["1"], grads["0"]):
        np.testing.assert_allclose(
            np.asarray(gu), np.asarray(gs), atol=1e-5, rtol=1e-4
        )
