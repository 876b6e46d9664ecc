"""Attention-reinjection plumbing test: attn_edit_fn reaches every layer."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.models.sd import StableDiffusion, tiny_test_config


@pytest.fixture(scope="module")
def sd():
    return StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)


def test_attn_edit_fn_changes_output_and_records_calls(sd, key):
    latent = sd.config.latent_size
    sample = jax.random.normal(key, (2, latent, latent, 4))
    ctx = jax.random.normal(key, (2, 77, sd.config.unet.cross_attention_dim))

    calls = []

    def uniformize(probs, place, is_cross):
        calls.append((place, is_cross, probs.shape[-1]))
        return jnp.ones_like(probs) / probs.shape[-1]

    base = sd.unet.apply({"params": sd.params["unet"]}, sample, 100.0, ctx)
    edited = sd.unet.apply(
        {"params": sd.params["unet"]}, sample, 100.0, ctx, attn_edit_fn=uniformize
    )
    assert not np.allclose(np.asarray(base), np.asarray(edited))
    places = {p for p, _, _ in calls}
    assert {"down", "mid", "up", "self"}.issubset(places)
    # cross calls have K=77, self calls K=Q
    assert any(is_cross and k == 77 for _, is_cross, k in calls)
    assert any((not is_cross) and k != 77 for _, is_cross, k in calls)


def test_identity_edit_fn_is_noop(sd, key):
    latent = sd.config.latent_size
    sample = jax.random.normal(key, (1, latent, latent, 4))
    ctx = jax.random.normal(key, (1, 77, sd.config.unet.cross_attention_dim))
    base = sd.unet.apply({"params": sd.params["unet"]}, sample, 10.0, ctx)
    same = sd.unet.apply(
        {"params": sd.params["unet"]}, sample, 10.0, ctx,
        attn_edit_fn=lambda p, place, is_cross: p,
    )
    # base uses the fused SDPA fast path, identity-edit forces the explicit
    # probs path — tiny float-reassociation differences are expected
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=2e-5)
