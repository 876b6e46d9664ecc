"""CLI: convert a NeRF-blender dataset into the thre3d camera-params layout.

Flag parity with reference: tools/convert_from_nerf_blender_dataset.py:33-94.
"""
import sys
from pathlib import Path

import click

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from voxe_tpu.data.blender import convert_nerf_blender_dataset  # noqa: E402


@click.command()
@click.option("-d", "--data_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path to the original nerf synthetic dataset scene")
@click.option("-o", "--output_path", type=click.Path(file_okay=False, dir_okay=True),
              required=True, help="path for outputting the converted scene")
def main(data_path, output_path) -> None:
    convert_nerf_blender_dataset(Path(data_path), Path(output_path))


if __name__ == "__main__":
    main()
