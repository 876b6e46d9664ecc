"""Training losses: photometric, volumetric-correlation, and TV regularizers.

Rebuilds of the reference loss zoo
(reference: thre3d_atom/modules/sds_trainer.py:470-567) as pure jnp functions.
"""
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def density_correlation_loss(densities_edit, densities_ref):
    """1 - Pearson correlation between the two full density grids
    (reference sds_trainer.py:507-524). Maximizing correlation keeps edited
    geometry aligned with the reconstruction."""
    x = densities_edit.reshape(-1)
    y = densities_ref.reshape(-1)
    xm = x - jnp.mean(x)
    ym = y - jnp.mean(y)
    corr = jnp.sum(xm * ym) / (
        jnp.sqrt(jnp.sum(xm**2)) * jnp.sqrt(jnp.sum(ym**2)) + 1e-12
    )
    return 1.0 - corr


def feature_correlation_loss(features_edit, features_ref):
    """Per-channel mean of (1 - corr) over SH feature grids
    (reference sds_trainer.py:526-534)."""
    x = features_edit.reshape(-1, features_edit.shape[-1])
    y = features_ref.reshape(-1, features_ref.shape[-1])
    xm = x - jnp.mean(x, axis=0, keepdims=True)
    ym = y - jnp.mean(y, axis=0, keepdims=True)
    corr = jnp.sum(xm * ym, axis=0) / (
        jnp.sqrt(jnp.sum(xm**2, axis=0)) * jnp.sqrt(jnp.sum(ym**2, axis=0)) + 1e-12
    )
    return jnp.mean(1.0 - corr)


def tv_loss_on_grid(grid_values):
    """Total-variation over a [X, Y, Z, C] grid
    (reference sds_trainer.py:563-567)."""
    dx = jnp.diff(grid_values, axis=0)
    dy = jnp.diff(grid_values, axis=1)
    dz = jnp.diff(grid_values, axis=2)
    return (
        jnp.mean(dx**2) + jnp.mean(dy**2) + jnp.mean(dz**2)
    )
