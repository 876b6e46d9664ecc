"""Training losses: photometric, volumetric-correlation, and TV regularizers.

Rebuilds of the reference loss zoo, formula-exact
(reference: thre3d_atom/modules/sds_trainer.py:494-567).
"""
import jax
import jax.numpy as jnp


def l1_loss(pred, target):
    return jnp.mean(jnp.abs(pred - target))


def l2_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def density_correlation_loss(sds_density, regular_density):
    """1 - Pearson correlation of the two full density grids; also returns the
    per-voxel correlation grid (reference sds_trainer.py:507-524 returns it
    detached for the optional feature loss)."""
    eps = 1e-7
    sds_var = jnp.mean((sds_density - jnp.mean(sds_density)) ** 2)
    regular_var = jnp.mean((regular_density - jnp.mean(regular_density)) ** 2)
    # the reference adds eps AFTER the sqrt (sds_trainer.py:522), which still
    # leaves an infinite sqrt-gradient when either grid is constant; the inner
    # eps makes the gradient finite with negligible numeric difference
    denominator = jnp.sqrt(sds_var * regular_var + eps * eps)

    covariance_grid = (sds_density - jnp.mean(sds_density)) * (
        regular_density - jnp.mean(regular_density)
    )
    correlation_grid = covariance_grid / (denominator + eps)
    correlation = jnp.mean(correlation_grid)
    return 1.0 - correlation, jax.lax.stop_gradient(correlation_grid)


def density_correlation_loss_fn(
    sds_density, regular_density, l2_mode: bool = False, l1_mode: bool = False
):
    """DCL with the reference's drop-in L2/L1 ablation modes
    (reference sds_trainer.py:494-505)."""
    if l2_mode:
        return l2_loss(sds_density, regular_density), None
    if l1_mode:
        return l1_loss(sds_density, regular_density), None
    return density_correlation_loss(sds_density, regular_density)


def feature_correlation_loss(sds_features, regular_features):
    """Reference's "feature correlation" term (sds_trainer.py:526-534): the
    squared CHANNEL-SUMMED difference of sigmoided features, summed over the
    grid (not a correlation despite the name — kept formula-exact)."""
    regular_features = jax.lax.stop_gradient(regular_features)
    diffs = jax.nn.sigmoid(sds_features) - jax.nn.sigmoid(regular_features)
    l2_diffs = jnp.sum(diffs, axis=-1) ** 2
    return jnp.sum(l2_diffs)


def tv_loss_on_grid(grid_values):
    """Mean-absolute total variation over a [X, Y, Z, C] grid, averaged over
    the three axes (reference sds_trainer.py:563-567)."""
    tv0 = jnp.mean(jnp.abs(jnp.diff(grid_values, axis=0)))
    tv1 = jnp.mean(jnp.abs(jnp.diff(grid_values, axis=1)))
    tv2 = jnp.mean(jnp.abs(jnp.diff(grid_values, axis=2)))
    return (tv0 + tv1 + tv2) / 3.0
