"""Mesh data-parallelism tests: sharding propagation + collective insertion."""
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
