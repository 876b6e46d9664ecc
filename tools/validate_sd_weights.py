"""CLI: validate (and smoke-test) a local Stable Diffusion weights directory.

Converts an HF snapshot (unet/, vae/, text_encoder/, tokenizer/) through
voxe_tpu.models.sd.weights, reports shape/name coverage, and runs one tiny
end-to-end SDS gradient to confirm the stack is usable before a long edit run.
--sanity_image additionally runs the full text-to-image path (prompt_to_img:
tokenize -> CLIP -> DDIM sampling loop -> VAE decode, reference
thre3d_atom/thre3d_reprs/sd.py:236-303) and writes a PNG — the immediate
eyeball check the moment real weights are staged. `--sd_version tiny` works
without a weights dir (random tiny weights) so CI can exercise the identical
glue (tests/test_demo_script.py).
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@click.command()
@click.option("-d", "--weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None,
              help="HF snapshot directory (optional for --sd_version tiny)")
@click.option("--sd_version", type=click.STRING, default="2.0", show_default=True)
@click.option("--run_smoke", type=click.BOOL, default=True, show_default=True,
              help="run a 64x64 SDS gradient after conversion")
@click.option("--sanity_image", type=click.Path(dir_okay=False), default=None,
              help="run prompt_to_img and write the sampled image here (PNG)")
@click.option("--sanity_prompt", type=click.STRING,
              default="a photograph of an astronaut riding a horse",
              show_default=True)
@click.option("--sanity_steps", type=click.INT, default=50, show_default=True,
              help="DDIM inference steps for --sanity_image")
def main(weights_dir, sd_version, run_smoke, sanity_image, sanity_prompt,
         sanity_steps) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.utils.logging import log

    if weights_dir is None and sd_version != "tiny":
        raise click.UsageError(
            "--weights_dir is required unless --sd_version tiny (random init)"
        )
    sd = StableDiffusion(
        sd_version, weights_dir=Path(weights_dir) if weights_dir else None
    )
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(sd.params)
    )
    log.info(f"conversion OK: {n_params / 1e6:.1f}M parameters loaded")
    log.info(f"tokenizer: {type(sd.tokenizer).__name__}")

    ids = sd.tokenizer("a photo of a dog")[0]
    log.info(f"tokenized sample: first ids {list(ids[:6])}")

    if run_smoke:
        emb = sd.get_text_embeds("a photo of a dog", "")
        pred_rgb = jnp.full((1, 64, 64, 3), 0.5)
        key = jax.random.PRNGKey(0)

        grads = jax.grad(
            lambda img: sd.sds_loss(sd.params, emb, img, key, jnp.asarray(500), 100.0)
        )(pred_rgb)
        g = np.asarray(grads)
        assert np.isfinite(g).all(), "non-finite SDS gradients"
        log.info(
            f"SDS smoke OK: grad mean|.|={np.abs(g).mean():.3e} "
            f"(finite, non-zero={np.abs(g).sum() > 0})"
        )

    if sanity_image is not None:
        import imageio.v2 as imageio

        log.info(
            f"sampling sanity image ({sanity_steps} DDIM steps): "
            f"{sanity_prompt!r}"
        )
        # run the sampling stages explicitly so finiteness is checked on the
        # FLOAT latents/image BEFORE the uint8 cast (prompt_to_img returns
        # uint8, on which NaNs have already become garbage pixels)
        text_embeds = sd.get_text_embeds(sanity_prompt, "")
        latents = sd.produce_latents(
            text_embeds, jax.random.PRNGKey(0),
            num_inference_steps=sanity_steps,
        )
        assert np.isfinite(np.asarray(latents)).all(), (
            "DDIM sampling produced non-finite latents — the staged weights "
            "are corrupt or mis-converted"
        )
        imgs_f = np.asarray(sd.decode_latents(sd.params["vae"], latents))
        assert np.isfinite(imgs_f).all(), (
            "VAE decode produced non-finite pixels — the staged weights are "
            "corrupt or mis-converted"
        )
        img = (imgs_f[0] * 255).round().astype("uint8")
        out = Path(sanity_image)
        out.parent.mkdir(parents=True, exist_ok=True)
        imageio.imwrite(out, img)
        log.info(f"sanity image written: {out} ({img.shape[0]}x{img.shape[1]})")

    log.info("weights directory is ready for --sd_weights_dir")


if __name__ == "__main__":
    main()
