"""CLI: compute CLIP/FID/PSNR quality metrics over a Vox-E result folder.

Layout parity with reference: evaluation/calculate_metrics.py:56-148 — walks
results/<scene>/{inputs,recon,<prompt>...}/ folders of PNG frames and writes
output_metrics.csv with columns [text CLIP, dir CLIP, FID recon, FID input,
PSNR recon]. CLIP/FID need locally provided weights (flags below); PSNR is
always computed.
"""
import os
import sys
from pathlib import Path

import click
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from evaluation.metrics_lib import (  # noqa: E402
    ClipScorer,
    InceptionEmbedder,
    avg_clip_directional_sim,
    avg_clip_text_sim,
    fid_between_folders,
    get_images,
    get_psnrs,
    load_prompt,
    remove_word_from_filenames,
)
from voxe_tpu.utils.logging import log  # noqa: E402


@click.command()
@click.option("-d", "--result_folder", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to result folder")
@click.option("--clip_model_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None,
              help="local CLIP ViT-B/32 snapshot (transformers format); CLIP columns NaN without it")
@click.option("--inception_model_dir", type=click.Path(file_okay=False, dir_okay=True),
              required=False, default=None,
              help="dir containing inception_v3.pth; FID columns NaN without it")
def main(result_folder, clip_model_dir, inception_model_dir) -> None:
    result_path = Path(result_folder)

    clip_scorer = ClipScorer(Path(clip_model_dir)) if clip_model_dir else None
    embedder = (
        InceptionEmbedder(Path(inception_model_dir)) if inception_model_dir else None
    )
    if clip_scorer is None:
        log.info("no CLIP weights given -> CLIP columns will be NaN")
    if embedder is None:
        log.info("no Inception weights given -> FID columns will be NaN")

    dataframes, frame_titles = [], []
    for scene_dir_name in sorted(os.listdir(result_path)):
        scene_dir = result_path / scene_dir_name
        if scene_dir.is_file():
            continue
        remove_word_from_filenames(scene_dir, "color_")

        recon_path = scene_dir / "recon"
        input_path = scene_dir / "inputs"
        recon_imgs = get_images(recon_path)
        if clip_scorer is not None:
            clip_recon_img_features = clip_scorer.image_features(recon_imgs)
            clip_input_features = clip_scorer.text_features(load_prompt(recon_path))

        rows = {
            "text CLIP": [], "dir CLIP": [], "FID recon": [],
            "FID input": [], "PSNR recon": [],
        }
        prompts = []
        for prompt_dir_name in sorted(os.listdir(scene_dir)):
            if prompt_dir_name in ("inputs", "recon"):
                continue
            prompt_dir = scene_dir / prompt_dir_name
            if not prompt_dir.is_dir():
                continue
            prompts.append(prompt_dir_name)
            output_imgs = get_images(prompt_dir)

            rows["FID recon"].append(
                fid_between_folders(prompt_dir, recon_path, embedder)
            )
            rows["FID input"].append(
                fid_between_folders(prompt_dir, input_path, embedder)
            )
            rows["PSNR recon"].append(get_psnrs(output_imgs, recon_imgs))

            if clip_scorer is not None:
                out_text_features = clip_scorer.text_features(load_prompt(prompt_dir))
                out_img_features = clip_scorer.image_features(output_imgs)
                rows["text CLIP"].append(
                    avg_clip_text_sim(out_img_features, out_text_features)
                )
                rows["dir CLIP"].append(
                    avg_clip_directional_sim(
                        clip_input_features,
                        clip_recon_img_features,
                        out_text_features,
                        out_img_features,
                    )
                )
            else:
                rows["text CLIP"].append(float("nan"))
                rows["dir CLIP"].append(float("nan"))

        dataframes.append(pd.DataFrame(data=rows, index=prompts))
        frame_titles.append(scene_dir_name)

    output_csv_path = result_path / "output_metrics.csv"
    with open(output_csv_path, "w") as f:
        for df, title in zip(dataframes, frame_titles):
            f.write(title + "\n")
            df.to_csv(f)
            f.write("\n")
    log.info(f"metrics written to {output_csv_path}")


if __name__ == "__main__":
    main()
