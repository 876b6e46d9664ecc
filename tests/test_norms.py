"""ReduceFirstGroupNorm parity vs flax nn.GroupNorm (values, grads, params).

The SD stack's GroupNorms (unet.py / vae.py) ride make_group_norm; these
tests pin the reduce-first NHWC implementation to flax's reference
semantics so the swap is purely a layout/performance change.
"""
import importlib

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.models.sd import norms as norms_mod
from voxe_tpu.models.sd.norms import ReduceFirstGroupNorm, make_group_norm


def _pair(num_groups, epsilon):
    return (
        ReduceFirstGroupNorm(num_groups=num_groups, epsilon=epsilon),
        nn.GroupNorm(num_groups=num_groups, epsilon=epsilon),
    )


@pytest.mark.parametrize(
    "shape,groups",
    [
        ((2, 8, 8, 320), 32),  # SD group size 10 (the lane-hostile case)
        ((1, 4, 4, 128), 32),
        ((3, 5, 7, 64), 16),  # non-square spatial, uneven dims
    ],
)
def test_values_match_flax(shape, groups):
    ours, ref = _pair(groups, 1e-5)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, shape, jnp.float32) * 3.0 + 0.7
    p_ours = ours.init(jax.random.PRNGKey(1), x)
    p_ref = ref.init(jax.random.PRNGKey(1), x)
    # param trees are interchangeable (names AND shapes)
    chex_tree = jax.tree_util.tree_structure(p_ours)
    assert chex_tree == jax.tree_util.tree_structure(p_ref)
    # non-trivial affine params, shared by both
    params = {
        "params": {
            "scale": jnp.linspace(0.5, 1.5, shape[-1]),
            "bias": jnp.linspace(-0.3, 0.3, shape[-1]),
        }
    }
    y_ours = ours.apply(params, x)
    y_ref = ref.apply(params, x)
    np.testing.assert_allclose(np.asarray(y_ours), np.asarray(y_ref), atol=2e-5)


def test_bf16_input_stays_bf16_and_matches():
    ours, ref = _pair(32, 1e-6)
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 8, 8, 320), jnp.float32)
    params = ours.init(jax.random.PRNGKey(3), x)
    y_ours = ours.apply(params, x.astype(jnp.bfloat16))
    y_ref = ref.apply(params, x.astype(jnp.bfloat16))
    assert y_ours.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(y_ours, np.float32), np.asarray(y_ref, np.float32), atol=3e-2
    )


def test_gradients_match_flax():
    ours, ref = _pair(8, 1e-5)
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 64), jnp.float32)
    params = ours.init(jax.random.PRNGKey(5), x)
    cot = jax.random.normal(jax.random.PRNGKey(6), x.shape, jnp.float32)

    def run(mod):
        def loss(p, xx):
            return jnp.sum(mod.apply(p, xx) * cot)

        return jax.grad(loss, argnums=(0, 1))(params, x)

    (gp_o, gx_o), (gp_r, gx_r) = run(ours), run(ref)
    np.testing.assert_allclose(np.asarray(gx_o), np.asarray(gx_r), atol=1e-4)
    for k in ("scale", "bias"):
        np.testing.assert_allclose(
            np.asarray(gp_o["params"][k]), np.asarray(gp_r["params"][k]), atol=1e-4
        )


def test_factory_env_fallback(monkeypatch):
    monkeypatch.setenv("VOXE_REDUCE_FIRST_GN", "0")
    assert isinstance(make_group_norm(32, 1e-5, "n"), nn.GroupNorm)
    monkeypatch.setenv("VOXE_REDUCE_FIRST_GN", "1")
    assert isinstance(make_group_norm(32, 1e-5, "n"), ReduceFirstGroupNorm)
    monkeypatch.delenv("VOXE_REDUCE_FIRST_GN")
    assert isinstance(make_group_norm(32, 1e-5, "n"), ReduceFirstGroupNorm)
    importlib.reload(norms_mod)  # no import-time env caching


def test_rejects_indivisible_channels():
    with pytest.raises(ValueError):
        ReduceFirstGroupNorm(num_groups=32).init(
            jax.random.PRNGKey(0), jnp.ones((1, 2, 2, 48))
        )
