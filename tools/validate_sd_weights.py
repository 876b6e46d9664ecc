"""CLI: validate (and smoke-test) a local Stable Diffusion weights directory.

Converts an HF snapshot (unet/, vae/, text_encoder/, tokenizer/) through
voxe_tpu.models.sd.weights, reports shape/name coverage, and runs one tiny
end-to-end SDS gradient to confirm the stack is usable before a long edit run.
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


@click.command()
@click.option("-d", "--weights_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="HF snapshot directory")
@click.option("--sd_version", type=click.STRING, default="2.0", show_default=True)
@click.option("--run_smoke", type=click.BOOL, default=True, show_default=True,
              help="run a 64x64 SDS gradient after conversion")
def main(weights_dir, sd_version, run_smoke) -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxe_tpu.models.sd import StableDiffusion
    from voxe_tpu.utils.logging import log

    sd = StableDiffusion(sd_version, weights_dir=Path(weights_dir))
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
    log.info("weights directory is ready for --sd_weights_dir")


if __name__ == "__main__":
    main()
