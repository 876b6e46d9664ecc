"""Mesh data-parallelism tests: sharding propagation + collective insertion."""
import os
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from voxe_tpu.grid.voxels import VoxelGrid, VoxelGridConfig, VoxelSize
from voxe_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from voxe_tpu.render.interface import SHVoxGridRenderConfig
from voxe_tpu.train.recon import make_recon_train_step
from voxe_tpu.utils.camera import CameraBounds, CameraIntrinsics


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest provides 8 virtual CPU devices"
    return make_mesh()


def _setup(mesh, ray_batch=1024):
    res = 12
    grid = VoxelGrid(
        jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)),
        VoxelGridConfig(
            voxel_size=VoxelSize(*[3.0 / res] * 3),
            density_preactivation="identity",
            density_postactivation="softplus",
        ),
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    opt = optax.adam(0.01)
    intr = CameraIntrinsics(16, 16, 16.0)
    step = make_recon_train_step(intr, rcfg, opt, ray_batch_size=ray_batch, mesh=mesh)
    images = jnp.zeros((4, 16, 16, 3))
    poses = jnp.tile(jnp.eye(3, 4)[None], (4, 1, 1)).at[:, 2, 3].set(4.0)
    return step, grid, opt.init(grid), images, poses


def test_sharded_step_compiles_with_allreduce(mesh):
    step, grid, opt_state, images, poses = _setup(mesh)
    lowered = step.lower(grid, opt_state, images, poses, jnp.arange(4), jax.random.PRNGKey(0))
    compiled = lowered.compile()
    hlo = compiled.as_text()
    # the replicated-grid gradient reduction must ride an all-reduce
    assert "all-reduce" in hlo, "no all-reduce in the sharded step HLO"


def test_sharded_step_matches_unsharded(mesh):
    """Same seed -> numerically matching update with and without the mesh."""
    step_m, grid, opt_state, images, poses = _setup(mesh)
    step_s = None
    from voxe_tpu.train.recon import make_recon_train_step

    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    opt = optax.adam(0.01)
    intr = CameraIntrinsics(16, 16, 16.0)
    step_s = make_recon_train_step(intr, rcfg, opt, ray_batch_size=1024, mesh=None)

    key = jax.random.PRNGKey(7)
    g_m, _, m_m = step_m(grid, opt_state, images, poses, jnp.arange(4), key)
    g_s, _, m_s = step_s(grid, opt_state, images, poses, jnp.arange(4), key)
    np.testing.assert_allclose(
        np.asarray(g_m.densities), np.asarray(g_s.densities), rtol=1e-4, atol=1e-5
    )
    assert float(m_m["total_loss"]) == pytest.approx(float(m_s["total_loss"]), rel=1e-4)


def test_shard_and_replicate_constraints(mesh):
    x = jnp.zeros((64, 3))

    @jax.jit
    def f(x):
        return shard_rays(mesh, x) * 2.0

    out = f(x)
    assert out.sharding.is_equivalent_to(
        jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec("rays", None)),
        out.ndim,
    )

    @jax.jit
    def g(x):
        return replicate(mesh, x * 1.0)

    out2 = g(x)
    assert out2.sharding.is_fully_replicated


def _tiny_grid(res=12):
    return VoxelGrid(
        jnp.zeros((res, res, res, 1)), jnp.zeros((res, res, res, 3)),
        VoxelGridConfig(
            voxel_size=VoxelSize(*[3.0 / res] * 3),
            density_preactivation="identity",
            density_postactivation="softplus",
        ),
        attn=jnp.zeros((res, res, res, 1)),
    )


def test_sds_step_sharded_matches_unsharded(mesh, key):
    """The SDS edit step under ray-DP == single-device, same seed."""
    from voxe_tpu.models.sd import StableDiffusion, tiny_test_config
    from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays
    from voxe_tpu.train.sds import make_sds_train_step

    grid = _tiny_grid()
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True, perturb_sampled_points=False,
    )
    sd = StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)
    opt = optax.adam(0.01)
    opt_state = opt.init(grid)
    intr = CameraIntrinsics(16, 16, 16.0)
    rays = flatten_rays(
        cast_rays(intr, jnp.eye(3), jnp.array([[0.0], [0.0], [4.0]]))
    )
    text = sd.get_text_embeds("a yarn doll", "")
    pixels = jnp.zeros((16 * 16, 3))
    ref_d, ref_f = jnp.copy(grid.densities), jnp.copy(grid.features)
    t = jnp.asarray(400)

    outs = {}
    for name, m in (("mesh", mesh), ("single", None)):
        step = make_sds_train_step(
            sd, rcfg, opt, (16, 16),
            density_correlation_weight=200.0, tv_density_weight=0.1, mesh=m,
        )
        g, _, metrics = step(
            grid, opt_state, sd.params, text, rays, pixels, ref_d, ref_f, key, t
        )
        outs[name] = (np.asarray(g.densities), float(metrics["total_loss"]))

    np.testing.assert_allclose(outs["mesh"][0], outs["single"][0], rtol=1e-4, atol=1e-5)
    assert outs["mesh"][1] == pytest.approx(outs["single"][1], rel=1e-4)


def test_refine_attn_step_sharded_matches_unsharded(mesh, key):
    """The dual attn-grid refinement update under ray-DP == single-device.

    Mirrors refine.py's jitted attn_train_step (the trainer builds it inline;
    this replicates its body against both mesh settings)."""
    from voxe_tpu.render.interface import render_sh_voxel_grid_attn
    from voxe_tpu.render.rays import Rays, cast_rays, flatten_rays
    from voxe_tpu.train.losses import tv_loss_on_grid
    from voxe_tpu.train.refine import calc_loss_on_attn_grid
    from voxe_tpu.parallel.mesh import replicate as repl, shard_rays as shard

    base_grid = _tiny_grid()
    # non-trivial densities so the attn render has support
    base_grid = base_grid.replace(
        densities=jnp.full_like(base_grid.densities, 5.0)
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True, perturb_sampled_points=False,
    )
    intr = CameraIntrinsics(16, 16, 16.0)
    rays0 = flatten_rays(
        cast_rays(intr, jnp.eye(3), jnp.array([[0.0], [0.0], [4.0]]))
    )
    opt = optax.adam(0.01)
    attn0 = jnp.zeros_like(base_grid.attn) + 0.1
    target = jnp.linspace(0.0, 1.0, 16 * 16).reshape(16, 16)

    def make_step(m):
        @jax.jit
        def step(attn, opt_state, rays, target_map, k):
            if m is not None:
                attn = repl(m, attn)
                rays = Rays(shard(m, rays.origins), shard(m, rays.directions))
                target_map = shard(m, target_map.reshape(-1))

            def loss_fn(a):
                grid = base_grid.replace(attn=a)
                out = render_sh_voxel_grid_attn(grid, rays, rcfg, key=k)
                attn_loss = calc_loss_on_attn_grid(out.colour[..., 0], target_map)
                return attn_loss + tv_loss_on_grid(a) * 0.001, attn_loss

            (loss, attn_l), grads = jax.value_and_grad(loss_fn, has_aux=True)(attn)
            updates, new_opt = opt.update(grads, opt_state, attn)
            return optax.apply_updates(attn, updates), new_opt, loss

        return step

    a_m, _, l_m = make_step(mesh)(attn0, opt.init(attn0), rays0, target, key)
    a_s, _, l_s = make_step(None)(attn0, opt.init(attn0), rays0, target, key)
    np.testing.assert_allclose(np.asarray(a_m), np.asarray(a_s), rtol=1e-4, atol=1e-5)
    assert float(l_m) == pytest.approx(float(l_s), rel=1e-4)
    assert float(l_m) > 0.0  # the masked loss actually fired


def test_recon_trainer_honors_num_devices(tmp_path):
    """End-to-end: the production recon trainer on the 8-device mesh runs and
    produces finite losses (VERDICT round-1: num_devices was ignored)."""
    from voxe_tpu.data.dataset import PosedImagesDataset
    from voxe_tpu.data.synthetic import generate_synthetic_scene
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.train.recon import train_sh_vox_grid_vol_mod_with_posed_images

    scene_dir = generate_synthetic_scene(
        tmp_path / "data", num_train=4, num_test=1, image_size=16, focal=16.0,
        grid_res=16,
    )
    ds = PosedImagesDataset(
        scene_dir / "images",
        scene_dir / "train_camera_params.json",
        rgba_white_bkgd=True,
    )
    res = 8
    grid = _tiny_grid(res)
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=8, camera_bounds=ds.camera_bounds, white_bkgd=True,
        render_num_samples_per_ray=8, parallel_rays_chunk_size=256,
    )
    vol_mod = VolumetricModel(grid, rcfg)
    out = train_sh_vox_grid_vol_mod_with_posed_images(
        vol_mod, ds, tmp_path / "out",
        ray_batch_size=256, num_stages=1, num_iterations_per_stage=4,
        save_freq=100, test_freq=100, feedback_freq=100, summary_freq=2,
        fast_debug_mode=True, num_devices=8,
    )
    assert np.isfinite(np.asarray(out.grid.densities)).all()


def test_multihost_init_two_cpu_processes(tmp_path):
    """jax.distributed smoke test (SURVEY §5 distributed-backend spec): two
    CPU processes form one 4-device SPMD program through
    maybe_init_distributed and psum across the global mesh."""
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent("""
        import os, sys
        sys.path.insert(0, "/root/repo")
        os.environ["VOXE_PLATFORM"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        from voxe_tpu.parallel.distributed import maybe_init_distributed, is_primary_host
        assert maybe_init_distributed(True)
        import jax, jax.numpy as jnp
        import numpy as np
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
        assert jax.process_count() == 2, jax.process_count()
        assert jax.device_count() == 4, jax.device_count()
        mesh = Mesh(np.asarray(jax.devices()), ("rays",))
        # every process contributes its local shard of a global [4] array
        local = jnp.arange(2, dtype=jnp.float32) + 2 * jax.process_index()
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("rays")), np.asarray(local), (4,)
        )
        @jax.jit
        def total(a):
            return jnp.sum(a)
        out = float(total(arr))
        assert out == 0 + 1 + 2 + 3, out
        print(f"proc {jax.process_index()} primary={is_primary_host()} ok")
    """)
    # bind port 0 to reserve a free ephemeral port — a fixed port collides
    # when two test runs (or a stale coordinator) share the host
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            JAX_COORDINATOR_ADDRESS=f"localhost:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", prog], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, f"stdout:{so[-2000:]}\nstderr:{se[-2000:]}"
    assert "primary=True ok" in outs[0][0]
    assert "primary=False ok" in outs[1][0]


def test_recon_multi_step_shearwarp_sharded_matches_unsharded(mesh, key=jax.random.PRNGKey(11)):
    """The K-fused shear-warp recon program (the trainer's steps_per_call>1
    path, r5) under mesh DP must match the mesh-free program — the scan body
    shards each step's base rows exactly like the single-dispatch step."""
    from voxe_tpu.train.recon import (
        make_recon_train_multi_step_shearwarp,
        warp_dataset_to_base,
    )
    from voxe_tpu.utils.camera import pose_spherical

    res = 12
    grid = VoxelGrid(
        jax.random.uniform(jax.random.PRNGKey(0), (res, res, res, 1), minval=-1.0),
        jax.random.uniform(jax.random.PRNGKey(1), (res, res, res, 3), minval=-1.0),
        VoxelGridConfig(
            voxel_size=VoxelSize(*[3.0 / res] * 3),
            density_preactivation="identity",
            density_postactivation="softplus",
        ),
    )
    rcfg = SHVoxGridRenderConfig(
        num_samples_per_ray=16, camera_bounds=CameraBounds(2.0, 6.0),
        white_bkgd=True, perturb_sampled_points=False,
    )
    intr = CameraIntrinsics(16, 16, 16.0)
    poses_np = [
        np.concatenate(
            [np.asarray(p.rotation), np.asarray(p.translation).reshape(3, 1)], axis=1
        )
        for p in (pose_spherical(y, 30.0, 4.0) for y in (20.0, 140.0, 260.0))
    ]
    poses = jnp.asarray(np.stack(poses_np))
    images = jnp.zeros((3, 16, 16, 3))
    base_hw = (16, 16)
    targets, masks = warp_dataset_to_base(images, poses, intr, grid, base_hw)
    opt = optax.adam(0.01)
    opt_state = opt.init(grid)
    idxs = jnp.asarray([0, 2, 1], jnp.int32)

    multi_m = make_recon_train_multi_step_shearwarp(rcfg, opt, base_hw, 3, mesh=mesh)
    multi_s = make_recon_train_multi_step_shearwarp(rcfg, opt, base_hw, 3, mesh=None)
    g_m, _, m_m = multi_m(grid, opt_state, targets, masks, poses, idxs, key)
    g_s, _, m_s = multi_s(grid, opt_state, targets, masks, poses, idxs, key)
    np.testing.assert_allclose(
        np.asarray(g_m.densities), np.asarray(g_s.densities), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_m.features), np.asarray(g_s.features), rtol=1e-4, atol=1e-5
    )
    assert float(m_m["total_loss"]) == pytest.approx(float(m_s["total_loss"]), rel=1e-4)
