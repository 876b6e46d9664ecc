"""Stable-Diffusion stack tests at tiny config (no weights needed)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from voxe_tpu.models.sd import (
    DDIMScheduler,
    StableDiffusion,
    scoreDistillationLoss,
    specify_gradient,
    tiny_test_config,
)


@pytest.fixture(scope="module")
def sd():
    return StableDiffusion(config=tiny_test_config(), unet_dtype=jnp.float32)


def test_scheduler_alphas_monotone():
    sched = DDIMScheduler(1000)
    alphas = np.asarray(sched.alphas_cumprod)
    assert alphas.shape == (1000,)
    assert (np.diff(alphas) < 0).all()
    assert 0 < alphas[-1] < alphas[0] < 1


def test_add_noise_at_t0_is_nearly_clean():
    sched = DDIMScheduler(1000)
    latents = jnp.ones((1, 4, 4, 4))
    noise = jnp.zeros_like(latents)
    noisy = sched.add_noise(latents, noise, jnp.asarray(0))
    np.testing.assert_allclose(np.asarray(noisy), np.sqrt(1 - 0.00085), rtol=1e-4)


def test_specify_gradient_injects_gradient():
    latents = jnp.ones((2, 4, 4, 4))
    gt_grad = jnp.full_like(latents, 3.0)

    loss, vjp = jax.vjp(lambda l: specify_gradient(l, gt_grad), latents)
    assert float(loss) == 0.0
    (dlatents,) = vjp(jnp.ones(()))
    # grad / batch_size (reference sd.py:31-34)
    np.testing.assert_allclose(np.asarray(dlatents), 3.0 / 2.0, rtol=1e-6)


def test_text_embeds_shape_and_cache(sd):
    emb = sd.get_text_embeds("a yarn doll", "")
    assert emb.shape == (2, 77, sd.config.clip.hidden_size)
    assert sd.get_text_embeds("a yarn doll", "") is emb  # cached


def test_vae_roundtrip_shapes(sd):
    img = jnp.zeros((1, sd.config.image_size, sd.config.image_size, 3)) + 0.5
    latents = sd.encode_imgs(sd.params["vae"], img)
    assert latents.shape == (1, sd.config.latent_size, sd.config.latent_size, 4)
    decoded = sd.decode_latents(sd.params["vae"], latents)
    assert decoded.shape == img.shape
    assert np.isfinite(np.asarray(decoded)).all()


def test_sds_loss_gradient_flows_to_image(sd, key):
    emb = sd.get_text_embeds("a red cube", "")
    pred_rgb = jnp.full((1, 32, 32, 3), 0.5)

    def loss_fn(img):
        return sd.sds_loss(sd.params, emb, img, key, jnp.asarray(500), 100.0)

    loss, grads = jax.value_and_grad(loss_fn)(pred_rgb)
    assert float(loss) == 0.0  # dummy loss value (reference sd.py:27)
    g = np.asarray(grads)
    assert np.isfinite(g).all()
    assert np.abs(g).sum() > 0.0  # SDS gradient reached the image


def test_sds_loss_is_jittable(sd, key):
    emb = sd.get_text_embeds("a red cube", "")
    pred_rgb = jnp.full((1, 32, 32, 3), 0.5)

    @jax.jit
    def step(img, k, t):
        return jax.grad(
            lambda im: sd.sds_loss(sd.params, emb, im, k, t, 100.0)
        )(img)

    g1 = step(pred_rgb, key, jnp.asarray(100))
    g2 = step(pred_rgb, key, jnp.asarray(900))  # traced t: no recompile needed
    assert np.isfinite(np.asarray(g1)).all()
    assert not np.allclose(np.asarray(g1), np.asarray(g2))


def test_t_schedule_annealing():
    sd_small = StableDiffusion(
        config=tiny_test_config(),
        t_sched_start=10,
        t_sched_freq=5,
        t_sched_gamma=0.5,
        unet_dtype=jnp.float32,
    )
    assert sd_small.max_step_ratio == 0.98
    sd_small.update_t_schedule(10)
    assert sd_small.max_step_ratio == pytest.approx(0.49)
    sd_small.update_t_schedule(15)
    sd_small.update_t_schedule(20)
    # floored at 0.22 (reference sd.py:181-183)
    assert sd_small.max_step_ratio == pytest.approx(0.22)


def test_directional_sds_wrapper(sd, key):
    sds = scoreDistillationLoss("a yarn doll", sd_model=sd, directional=True)
    assert set(sds.text_encodings) == {"side", "overhead", "back", "front"}
    out = jnp.full((32 * 32, 3), 0.5)
    loss = sds.training_step(out, 32, 32, directions=["front"], key=key)
    assert float(loss) == 0.0


def test_attention_capture_and_aggregation(sd, key):
    maps, t = sd.get_attn_map(
        "a dog wearing a party hat", jnp.full((1, 48, 48, 3), 0.5), key,
        timestamp=200, indices_to_fetch=[1, 3],
    )
    assert t == 200
    assert len(maps) == 2
    for m in maps:
        assert m.shape == (48, 48)
        assert np.isfinite(np.asarray(m)).all()


def test_attn_map_jit_cache_is_bucketed(sd, key):
    """Different prompt lengths within one bucket reuse ONE compiled program
    (the capture UNet previously recompiled per (resolution, token-count))."""
    rgb = jnp.full((1, 48, 48, 3), 0.5)
    sd._attn_map_jit_cache = {}
    maps_a, _ = sd.get_attn_map(
        "a dog", rgb, key, timestamp=100, indices_to_fetch=[1, 2]
    )
    maps_b, _ = sd.get_attn_map(
        "a dog wearing a party hat, front view", rgb, key, timestamp=100,
        indices_to_fetch=[1, 2, 3, 4, 5],
    )
    assert len(maps_a) == 2 and len(maps_b) == 5
    assert len(sd._attn_map_jit_cache) == 1  # one (48, 48, bucket=8) entry
    # a second resolution adds exactly one more entry
    sd.get_attn_map(
        "a dog", jnp.full((1, 32, 32, 3), 0.5), key, timestamp=100,
        indices_to_fetch=[1],
    )
    assert len(sd._attn_map_jit_cache) == 2


def test_zero_init_matches_random_init_shapes():
    from voxe_tpu.models.sd.config import tiny_test_config

    sd_zero = StableDiffusion(config=tiny_test_config(), init_mode="zeros")
    sd_rand = StableDiffusion(config=tiny_test_config())
    z_shapes = jax.tree_util.tree_map(lambda x: x.shape, sd_zero.params)
    r_shapes = jax.tree_util.tree_map(lambda x: x.shape, sd_rand.params)
    assert z_shapes == r_shapes


def test_scheduler_timesteps_have_steps_offset():
    """The SD DDIMScheduler config ships steps_offset=1: sampling runs
    [981, 961, ..., 1], not [980, ..., 0] (diffusers set_timesteps)."""
    sched = DDIMScheduler(1000)
    ts = np.asarray(sched.timesteps(50))
    assert len(ts) == 50
    assert ts[0] == 981 and ts[-1] == 1
    assert (np.diff(ts) == -20).all()


def test_scheduler_eta_stochastic_step():
    """eta=0 is deterministic DDIM; eta>0 adds the sigma_t noise term and is
    reproducible per key (previously eta was silently ignored)."""
    sched = DDIMScheduler(1000)
    lat = jnp.ones((1, 4, 4, 4))
    eps = 0.1 * jnp.ones_like(lat)
    det = sched.step(eps, 500, 480, lat)
    np.testing.assert_array_equal(
        np.asarray(det), np.asarray(sched.step(eps, 500, 480, lat, eta=0.0))
    )
    k = jax.random.PRNGKey(0)
    sto = sched.step(eps, 500, 480, lat, eta=1.0, key=k)
    assert not np.allclose(np.asarray(sto), np.asarray(det))
    np.testing.assert_array_equal(
        np.asarray(sto), np.asarray(sched.step(eps, 500, 480, lat, eta=1.0, key=k))
    )
    assert np.isfinite(np.asarray(sto)).all()


def test_tokenizer_pattern_handles_unicode():
    """CLIP's \\p{L}/\\p{N} classes: accented words stay ONE token run
    instead of splitting at the non-ASCII character."""
    import re

    from voxe_tpu.models.sd.tokenizer import _PAT

    assert re.findall(_PAT, "café dog") == ["café", "dog"]
    assert re.findall(_PAT, "3 dogs!") == ["3", "dogs", "!"]
    assert re.findall(_PAT, "it's a_b") == ["it", "'s", "a", "_", "b"]


def test_tokenizer_pad_token_discovery(tmp_path):
    """SD 1.x pads with EOS; SD 2.x tokenizer dirs declare pad_token '!' —
    the staged dir's declaration wins (reference pipelines pad with it)."""
    import json as _json

    from tests.test_sd_weights_numeric import _write_tiny_tokenizer
    from voxe_tpu.models.sd.tokenizer import CLIPTokenizer

    d = tmp_path / "tok"
    _write_tiny_tokenizer(d, 0)
    tok = CLIPTokenizer(d)
    assert tok.pad_token_id == tok.eos_token_id  # no declaration -> EOS

    (d / "special_tokens_map.json").write_text(
        _json.dumps({"pad_token": {"content": "!"}})
    )
    tok2 = CLIPTokenizer(d)
    assert tok2.pad_token_id == tok2.encoder["!"]
    ids = tok2("hi")[0]
    assert ids[0] == tok2.bos_token_id
    assert ids[-1] == tok2.pad_token_id
    assert (ids == tok2.eos_token_id).sum() == 1  # EOS terminates, pad fills
