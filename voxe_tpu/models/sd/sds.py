"""Stable Diffusion wrapper + Score Distillation Sampling (SDS) loss.

Rebuild of reference: thre3d_atom/thre3d_reprs/sd.py:20-385.

* `specify_gradient` is the JAX form of the reference's SpecifyGradient
  autograd.Function (sd.py:20-34): forward returns a zero "loss"; the VJP
  injects the precomputed SDS gradient w(t)(eps_hat - eps)/B into the latents.
* The whole render->resize->VAE-encode->noise->UNet(CFG)->grad-inject chain is
  a pure function of (params, text embeddings, image, key, t-bounds) — the
  caller jits it as part of the edit train step (the north-star fusion;
  the reference crosses the autograd boundary 3x per step).
* Max-timestep annealing (sd.py:176-187) is host-side schedule state; the
  sampled t rides into jit as a traced argument so annealing never recompiles.
* UNet weights are held in bfloat16 (frozen; MXU-native), the small grad
  arithmetic stays float32.
"""
from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from voxe_tpu.models.sd.clip_text import CLIPTextModel
from voxe_tpu.models.sd.config import SD_VERSIONS, SDConfig
from voxe_tpu.models.sd.scheduler import DDIMScheduler
from voxe_tpu.models.sd.tokenizer import (
    CLIPTokenizer,
    HashTokenizer,
    get_num_tokens,
)
from voxe_tpu.models.sd.unet import UNet2DConditionModel
from voxe_tpu.models.sd.vae import AutoencoderKL
from voxe_tpu.utils.logging import log

DIRECTION_PROMPTS = ("side", "overhead", "back", "front")


@jax.custom_vjp
def specify_gradient(latents, gt_grad):
    return jnp.zeros((), dtype=latents.dtype)


def _specify_fwd(latents, gt_grad):
    return jnp.zeros((), dtype=latents.dtype), (gt_grad, latents.shape[0])


def _specify_bwd(res, g):
    gt_grad, batch_size = res
    return (g * gt_grad / batch_size, jnp.zeros_like(gt_grad))


specify_gradient.defvjp(_specify_fwd, _specify_bwd)


class StableDiffusion:
    """Frozen SD pipeline: tokenizer + CLIP text + VAE + UNet + DDIM schedule.

    `weights_dir` should contain converted checkpoints (see
    voxe_tpu.models.sd.weights). Without it the models are randomly
    initialized — structurally complete, used for tests and plumbing.
    """

    def __init__(
        self,
        sd_version: str = "2.1",
        config: Optional[SDConfig] = None,
        weights_dir: Optional[Path] = None,
        t_sched_start: int = 1500,
        t_sched_freq: int = 500,
        t_sched_gamma: float = 1.0,
        seed: int = 0,
        unet_dtype=jnp.bfloat16,
        vae_dtype=None,
        init_mode: str = "random",
    ):
        if config is None:
            if sd_version == "tiny":  # test/plumbing alias
                from voxe_tpu.models.sd.config import tiny_test_config

                config = tiny_test_config()
            else:
                config = SD_VERSIONS[sd_version]
        self.config = config
        self.sd_version = self.config.version
        self.t_sched_start = t_sched_start
        self.t_sched_freq = t_sched_freq
        self.t_sched_gamma = t_sched_gamma
        self.unet_dtype = unet_dtype
        # VAE compute dtype follows the UNet by default: bf16 on TPU. The
        # encoder carries SDS gradients, but the injected score w(t)(eps_hat -
        # eps) is itself high-variance noise — bf16 quantization of its
        # pullback is far below the signal's own stochasticity. Profiled f32
        # VAE = the single largest cost of the edit step (512^2 convs,
        # BENCHMARKS.md round-2 trace).
        self.vae_dtype = unet_dtype if vae_dtype is None else vae_dtype

        self.scheduler = DDIMScheduler(
            self.config.num_train_timesteps,
            self.config.beta_start,
            self.config.beta_end,
        )
        self.num_train_timesteps = self.config.num_train_timesteps
        self.min_step_ratio = 0.02
        self.max_step_ratio = 0.98
        self.alphas = self.scheduler.alphas_cumprod

        self.clip = CLIPTextModel(self.config.clip)
        self.vae = AutoencoderKL(self.config.vae)
        self.unet = UNet2DConditionModel(self.config.unet)

        log.info(f"building stable diffusion ({self.sd_version}) ...")
        self.params: Dict[str, dict] = {}
        if weights_dir is not None:
            from voxe_tpu.models.sd.weights import load_sd_params

            self.params = load_sd_params(Path(weights_dir), self.config)
            self.tokenizer = CLIPTokenizer(Path(weights_dir) / "tokenizer")
        elif init_mode == "zeros":
            # benchmarking mode: identical shapes/FLOPs to real weights, but
            # materialized as device-side zeros without tracing an init pass
            log.info("no weights_dir given -> zero init (benchmark mode)")
            self.params = self._zero_init()
            self.tokenizer = HashTokenizer(self.config.clip.vocab_size)
        else:
            log.info("no weights_dir given -> random init (plumbing/test mode)")
            self.params = self._random_init(seed)
            self.tokenizer = HashTokenizer(self.config.clip.vocab_size)
        self.params["unet"] = jax.tree_util.tree_map(
            lambda x: x.astype(self.unet_dtype), self.params["unet"]
        )
        self.params["vae"] = jax.tree_util.tree_map(
            lambda x: x.astype(self.vae_dtype), self.params["vae"]
        )
        log.info("stable diffusion ready")

        self._text_embed_cache: Dict[str, jnp.ndarray] = {}
        self._jit_text_encode = jax.jit(
            lambda params, ids: self.clip.apply({"params": params}, ids)
        )

    def _random_init(self, seed: int) -> Dict[str, dict]:
        key = jax.random.PRNGKey(seed)
        k1, k2, k3 = jax.random.split(key, 3)
        cfg = self.config
        latent = cfg.latent_size
        clip_params = self.clip.init(k1, jnp.zeros((1, 77), jnp.int32))["params"]
        # full __call__ (encode+decode) so decoder/post_quant params exist too
        vae_params = self.vae.init(
            k2, jnp.zeros((1, cfg.image_size, cfg.image_size, 3))
        )["params"]
        unet_params = self.unet.init(
            k3,
            jnp.zeros((1, latent, latent, cfg.unet.in_channels)),
            jnp.zeros((1,)),
            jnp.zeros((1, 77, cfg.unet.cross_attention_dim)),
        )["params"]
        return {"clip": clip_params, "vae": vae_params, "unet": unet_params}

    def _zero_init(self) -> Dict[str, dict]:
        """Shape-only init (jax.eval_shape) materialized as zeros.

        Avoids compiling/executing the 1.3B-param random-init program — used
        by benchmarks where only shapes/FLOPs matter, not values."""
        shapes = jax.eval_shape(lambda: self._random_init(0))
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )

    # ------------------------------------------------------------------
    # text conditioning
    # ------------------------------------------------------------------
    def get_num_tokens(self, prompt: str) -> int:
        return get_num_tokens(self.tokenizer, prompt)

    def get_max_step_ratio(self) -> float:
        return self.max_step_ratio

    def get_text_embeds(self, prompt, negative_prompt="") -> jnp.ndarray:
        """[2, 77, D] (uncond, cond) — cached per prompt pair
        (reference sd.py:119-136)."""
        cache_key = f"{prompt}|||{negative_prompt}"
        if cache_key not in self._text_embed_cache:
            ids = jnp.asarray(
                np.concatenate(
                    [self.tokenizer(negative_prompt), self.tokenizer(prompt)], axis=0
                )
            )
            self._text_embed_cache[cache_key] = self._jit_text_encode(
                self.params["clip"], ids
            )
        return self._text_embed_cache[cache_key]

    # ------------------------------------------------------------------
    # SDS core (pure; call inside the caller's jit)
    # ------------------------------------------------------------------
    def encode_imgs(self, vae_params, imgs, key=None):
        """imgs [B, H, W, 3] in [0, 1] -> scaled latents (sd.py:272-280).

        Runs in vae_dtype (input cast in, latents cast back to f32 for the
        scheduler math); flax promotion would otherwise silently run every
        conv in f32 whenever the image arrives f32."""
        x = (2.0 * imgs - 1.0).astype(self.vae_dtype)
        latents = self.vae.apply({"params": vae_params}, x, key, method=self.vae.encode)
        return latents.astype(jnp.float32)

    def decode_latents(self, vae_params, latents):
        imgs = self.vae.apply(
            {"params": vae_params}, latents.astype(self.vae_dtype),
            method=self.vae.decode,
        )
        return jnp.clip(imgs.astype(jnp.float32) / 2.0 + 0.5, 0.0, 1.0)

    def unet_noise_pred(self, unet_params, latents_in, t, text_embeddings, capture_attn=False):
        """Classifier-free-guidance UNet call on [2B, h, w, 4] input."""
        apply_in = latents_in.astype(self.unet_dtype)
        ctx = text_embeddings.astype(self.unet_dtype)
        if capture_attn:
            out, state = self.unet.apply(
                {"params": unet_params}, apply_in, t, ctx,
                capture_attn=True, mutable=["attn_maps"],
            )
            return out.astype(jnp.float32), state["attn_maps"]
        out = self.unet.apply({"params": unet_params}, apply_in, t, ctx)
        return out.astype(jnp.float32)

    def sds_loss(
        self,
        params: Dict[str, dict],
        text_embeddings: jnp.ndarray,  # [2, 77, D]
        pred_rgb: jnp.ndarray,  # [B, H, W, 3] in [0, 1], differentiable
        key: jax.Array,
        t: jnp.ndarray,  # traced scalar int timestep
        guidance_scale: float = 100.0,
    ) -> jnp.ndarray:
        """The SDS "loss" whose gradient w.r.t. pred_rgb is the score
        distillation gradient (reference sd.py:174-234)."""
        size = self.config.image_size
        batch = pred_rgb.shape[0]
        k_enc, k_noise = jax.random.split(key)

        pred_512 = jax.image.resize(
            pred_rgb, (batch, size, size, 3), method="bilinear"
        )
        latents = self.encode_imgs(params["vae"], pred_512, key=k_enc)

        # noise prediction branch carries NO gradients (reference sd.py:204-215)
        latents_ng = jax.lax.stop_gradient(latents)
        noise = jax.random.normal(k_noise, latents_ng.shape, latents_ng.dtype)
        latents_noisy = self.scheduler.add_noise(latents_ng, noise, t)
        latent_model_input = jnp.concatenate([latents_noisy] * 2, axis=0)
        text_ctx = jnp.repeat(text_embeddings, batch, axis=0) if batch > 1 else text_embeddings
        noise_pred = self.unet_noise_pred(
            params["unet"], latent_model_input, t, text_ctx
        )
        noise_pred_uncond, noise_pred_text = jnp.split(noise_pred, 2, axis=0)
        noise_pred = noise_pred_text + guidance_scale * (
            noise_pred_text - noise_pred_uncond
        )

        w = 1.0 - self.alphas[t]
        grad = w * (noise_pred - noise)
        grad = jnp.nan_to_num(grad)
        return specify_gradient(latents, grad)

    # ------------------------------------------------------------------
    # host-side schedule + convenience API (reference parity)
    # ------------------------------------------------------------------
    def update_t_schedule(self, global_step: int) -> None:
        """Anneal max_step_ratio, floored at 0.22 (reference sd.py:176-187)."""
        if global_step >= self.t_sched_start and global_step % self.t_sched_freq == 0:
            self.max_step_ratio = max(self.max_step_ratio * self.t_sched_gamma, 0.22)

    def sample_timestep(self, key) -> jnp.ndarray:
        """t ~ U[min_step, max_step] with the current annealed bounds."""
        min_step = int(self.num_train_timesteps * self.min_step_ratio)
        max_step = int(self.num_train_timesteps * self.max_step_ratio)
        return jax.random.randint(key, (), min_step, max_step + 1)

    def train_step(
        self, text_embeddings, pred_rgb, key, guidance_scale=100.0, global_step=-1
    ):
        """Reference-shaped convenience wrapper (sd.py:174-234): updates the
        t schedule, samples t, returns the SDS loss value (use `sds_loss`
        directly inside jitted trainers)."""
        self.update_t_schedule(global_step)
        k_t, k_loss = jax.random.split(key)
        t = self.sample_timestep(k_t)
        return self.sds_loss(
            self.params, text_embeddings, pred_rgb, k_loss, t, guidance_scale
        )

    # ------------------------------------------------------------------
    # text-to-image sampling (reference sd.py:236-303)
    # ------------------------------------------------------------------
    def produce_latents(
        self,
        text_embeddings,
        key,
        height=None,
        width=None,
        num_inference_steps=50,
        guidance_scale=7.5,
        latents=None,
    ):
        height = height or self.config.image_size
        width = width or self.config.image_size
        factor = 2 ** (len(self.config.vae.block_out_channels) - 1)  # 8 for real SD
        if latents is None:
            latents = jax.random.normal(
                key,
                (
                    text_embeddings.shape[0] // 2,
                    height // factor,
                    width // factor,
                    self.config.unet.in_channels,
                ),
            )
        timesteps = self.scheduler.timesteps(num_inference_steps)

        # one jitted CFG denoise step, cached on the instance: a fresh @jax.jit
        # closure per produce_latents call would re-trace every invocation
        # (reference CFG form sd.py:215: text + g * (text - uncond))
        if not hasattr(self, "_sample_step_jit"):

            @jax.jit
            def sample_step(unet_params, latents, t, t_prev, text_embeddings, gs):
                inp = jnp.concatenate([latents] * 2, axis=0)
                noise_pred = self.unet_noise_pred(
                    unet_params, inp, t, text_embeddings
                )
                uncond, text = jnp.split(noise_pred, 2, axis=0)
                noise_pred = text + gs * (text - uncond)
                return self.scheduler.step(noise_pred, t, t_prev, latents)

            self._sample_step_jit = sample_step

        ts = np.asarray(timesteps)
        for i, t in enumerate(ts):
            t_prev = ts[i + 1] if i + 1 < len(ts) else -1
            latents = self._sample_step_jit(
                self.params["unet"], latents, int(t), int(t_prev),
                text_embeddings, float(guidance_scale),
            )
        return latents

    def prompt_to_img(
        self,
        prompts,
        negative_prompts="",
        key=None,
        height=None,
        width=None,
        num_inference_steps=50,
        guidance_scale=7.5,
        latents=None,
    ):
        key = key if key is not None else jax.random.PRNGKey(0)
        text_embeds = self.get_text_embeds(prompts, negative_prompts)
        latents = self.produce_latents(
            text_embeds, key, height, width, num_inference_steps, guidance_scale, latents
        )
        imgs = self.decode_latents(self.params["vae"], latents)
        return (np.asarray(imgs) * 255).round().astype("uint8")

    # ------------------------------------------------------------------
    # cross-attention extraction (reference sd.py:138-171)
    # ------------------------------------------------------------------
    def get_attn_map(
        self,
        prompt: str,
        pred_rgb: jnp.ndarray,  # [1, H, W, 3] in [0, 1]
        key: jax.Array,
        timestamp: int = 0,
        indices_to_fetch=(7,),
        guidance_scale: float = 100.0,
    ):
        """One noised UNet pass with attention capture; returns per-token 2D
        attention maps upsampled to the render resolution, and the t used.

        Token indices are passed to the jitted program as a TRACED array
        padded to a static bucket (multiple of 8), so the capture UNet
        compiles once per (resolution, bucket) — not once per prompt length
        (prompt lengths vary per direction suffix in the refinement loop)."""
        from voxe_tpu.models.sd.cross_attn import aggregate_token_maps

        orig_h, orig_w = pred_rgb.shape[1:3]
        text_embeddings = self.get_text_embeds(prompt, "")
        k_t, k_run = jax.random.split(key)
        if timestamp > 0:
            t = jnp.asarray(timestamp)
        else:
            t = self.sample_timestep(k_t)

        n = len(indices_to_fetch)
        bucket = min(77, 8 * ((n + 7) // 8))
        cache_key = (orig_h, orig_w, bucket)
        if not hasattr(self, "_attn_map_jit_cache"):
            self._attn_map_jit_cache = {}
        if cache_key not in self._attn_map_jit_cache:
            size = self.config.image_size

            @jax.jit
            def _compute(params, pred_rgb, text_embeddings, key, t, indices):
                k_enc, k_noise = jax.random.split(key)
                pred_512 = jax.image.resize(
                    pred_rgb, (1, size, size, 3), method="bilinear"
                )
                latents = self.encode_imgs(params["vae"], pred_512, key=k_enc)
                noise = jax.random.normal(k_noise, latents.shape, latents.dtype)
                latents_noisy = self.scheduler.add_noise(latents, noise, t)
                latent_model_input = jnp.concatenate([latents_noisy] * 2, axis=0)
                _, attn_maps = self.unet_noise_pred(
                    params["unet"], latent_model_input, t, text_embeddings,
                    capture_attn=True,
                )
                return aggregate_token_maps(
                    attn_maps, indices, orig_im_h=orig_h, orig_im_w=orig_w
                )

            self._attn_map_jit_cache[cache_key] = _compute

        padded = np.zeros((bucket,), np.int32)
        padded[:n] = np.asarray(list(indices_to_fetch), np.int32)
        stacked = self._attn_map_jit_cache[cache_key](
            self.params, pred_rgb, text_embeddings, k_run, t, jnp.asarray(padded)
        )
        maps = [stacked[i] for i in range(n)]
        return maps, int(t)


class scoreDistillationLoss:
    """Directional SDS wrapper (reference sd.py:333-385): pre-encodes the four
    "<prompt>, {side,overhead,back,front} view" embeddings and sums per-view
    SDS losses."""

    def __init__(
        self,
        prompt: str,
        sd_model: Optional[StableDiffusion] = None,
        t_sched_start: int = 1500,
        t_sched_freq: int = 500,
        t_sched_gamma: float = 1.0,
        directional: bool = True,
        sd_version: str = "2.0",
        weights_dir: Optional[Path] = None,
        config: Optional[SDConfig] = None,
    ):
        self.directional = directional
        self.sd_model = sd_model or StableDiffusion(
            sd_version,
            config=config,
            weights_dir=weights_dir,
            t_sched_start=t_sched_start,
            t_sched_freq=t_sched_freq,
            t_sched_gamma=t_sched_gamma,
        )

        if directional:
            self.text_encodings = {}
            for dir_prompt in DIRECTION_PROMPTS:
                log.info(f"encoding text for '{dir_prompt}' direction")
                self.text_encodings[dir_prompt] = self.sd_model.get_text_embeds(
                    prompt + f", {dir_prompt} view", ""
                )
        else:
            self.text_encoding = self.sd_model.get_text_embeds(prompt, "")

    def get_current_max_step_ratio(self):
        return self.sd_model.get_max_step_ratio()

    def encoding_for_direction(self, direction: Optional[str]):
        if self.directional:
            assert direction is not None, (
                "must supply direction in directional SDS mode"
            )
            return self.text_encodings[direction]
        return self.text_encoding

    def training_step(
        self,
        output,  # [H*W, 3] or [B, H, W, 3] rendered colours
        image_height: int,
        image_width: int,
        directions=None,
        key=None,
        global_step: int = -1,
        guidance_scale: float = 100.0,
    ):
        """Reference-shaped host API (sd.py:365-385). For jitted trainers use
        `sd_model.sds_loss` with `encoding_for_direction` instead."""
        out_imgs = jnp.reshape(output, (-1, image_height, image_width, 3))
        key = key if key is not None else jax.random.PRNGKey(0)
        if not self.directional:
            return self.sd_model.train_step(
                self.text_encoding, out_imgs, key, guidance_scale, global_step
            )
        loss = jnp.zeros(())
        for idx, dir_prompt in enumerate(directions):
            key, sub = jax.random.split(key)
            loss = loss + self.sd_model.train_step(
                self.text_encodings[dir_prompt], out_imgs, sub, guidance_scale,
                global_step,
            )
        return loss
