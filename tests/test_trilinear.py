"""Trilinear interpolation parity tests against torch.grid_sample semantics."""
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.ops.trilinear import trilinear_interpolate


def _torch_reference(grid_np, pts_np):
    """Ground truth via torch.grid_sample with the reference's permute
    convention (reference voxels.py:306-319)."""
    torch = pytest.importorskip("torch")
    g = torch.from_numpy(grid_np)[None].permute(0, 4, 3, 2, 1)  # [1,C,Z,Y,X]
    p = torch.from_numpy(pts_np)[None, None, None]  # [1,1,1,N,3]
    out = torch.nn.functional.grid_sample(g, p, align_corners=False)
    return out.permute(0, 2, 3, 4, 1).reshape(-1, grid_np.shape[-1]).numpy()


@pytest.mark.parametrize("shape", [(2, 2, 2, 1), (5, 4, 3, 7), (8, 8, 8, 4)])
def test_matches_torch_grid_sample(shape):
    rng = np.random.default_rng(0)
    grid = rng.standard_normal(shape).astype(np.float32)
    pts = rng.uniform(-1.3, 1.3, size=(257, 3)).astype(np.float32)  # incl. out-of-range
    ours = np.asarray(trilinear_interpolate(jnp.asarray(grid), jnp.asarray(pts)))
    ref = _torch_reference(grid, pts)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_center_of_single_cell():
    # a 1x1x1 grid: every in-range point returns a weighted value; the exact
    # center returns the cell value itself.
    grid = jnp.full((1, 1, 1, 2), 3.5)
    out = trilinear_interpolate(grid, jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_out_of_bounds_is_zero():
    grid = jnp.ones((4, 4, 4, 1))
    pts = jnp.array([[5.0, 0.0, 0.0], [0.0, -5.0, 0.0]])
    out = trilinear_interpolate(grid, pts)
    np.testing.assert_allclose(np.asarray(out), 0.0)


def test_gradient_flows():
    import jax

    grid = jnp.ones((3, 3, 3, 1))
    pts = jnp.zeros((5, 3))

    def loss(g):
        return jnp.sum(trilinear_interpolate(g, pts))

    g = jax.grad(loss)(grid)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(g)) == pytest.approx(5.0, rel=1e-5)
