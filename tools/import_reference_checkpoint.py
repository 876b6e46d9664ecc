"""CLI: convert a reference (PyTorch Vox-E) checkpoint into a voxe_tpu one.

The reference torch-pickles its save-info dict INCLUDING live function/class
objects from thre3d_atom (reference volumetric_model.py:85-99), so a plain
torch.load requires the original package. This importer installs lightweight
stub modules for every `thre3d_atom.*` symbol the pickle references, loads the
tensors, and rewrites them as a voxe_tpu npz checkpoint — giving users of the
reference a one-command migration path for their trained models.
"""
import sys
import types
from pathlib import Path

import click
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


import importlib.abc
import importlib.machinery


class _StubLoader(importlib.abc.Loader):
    def create_module(self, spec):
        mod = types.ModuleType(spec.name)
        mod.__path__ = []  # mark as package so submodule imports resolve

        def _getattr(name, _mod=spec.name):
            # fabricate a maximally tolerant placeholder class: constructible
            # with any args, state-settable, subclass of tuple so NamedTuple
            # payloads (VoxelSize etc.) unpickle as plain tuples
            def __new__(cls, *a, **k):
                if len(a) == 1 and isinstance(a[0], (tuple, list)):
                    a = tuple(a[0])  # cls(iterable) pickling form
                if a and not k:
                    try:
                        return tuple.__new__(cls, a)
                    except TypeError:
                        pass
                return tuple.__new__(cls, ())

            cls = type(
                name,
                (tuple,),
                {"__module__": _mod, "__new__": __new__},
            )
            setattr(mod, name, cls)
            return cls

        mod.__getattr__ = _getattr
        return mod

    def exec_module(self, module):
        pass


class _StubFinder(importlib.abc.MetaPathFinder):
    """Import hook fabricating any thre3d_atom.* module on demand so the
    reference's pickled class/function references resolve."""

    PREFIXES = ("thre3d_atom",)

    def find_spec(self, fullname, path=None, target=None):
        if fullname.split(".")[0] in self.PREFIXES:
            return importlib.machinery.ModuleSpec(
                fullname, _StubLoader(), is_package=True
            )
        return None


def _to_numpy(value):
    import torch

    if isinstance(value, torch.Tensor):
        return value.detach().cpu().numpy()
    return value


@click.command()
@click.option("-i", "--input_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="reference .pth checkpoint (torch pickle)")
@click.option("-o", "--output_path", type=click.Path(file_okay=True, dir_okay=False),
              required=True, help="output voxe_tpu checkpoint path")
@click.option("--train_num_samples_per_ray", type=click.INT, default=256, show_default=True)
@click.option("--render_num_samples_per_ray", type=click.INT, default=512, show_default=True)
@click.option("--white_bkgd", type=click.BOOL, default=True, show_default=True)
@click.option("--density_postactivation", type=click.Choice(["softplus", "relu", "identity"]),
              default="softplus", show_default=True,
              help="the activation the reference model was trained with "
                   "(not recoverable from the pickle stubs)")
def main(input_path, output_path, train_num_samples_per_ray,
         render_num_samples_per_ray, white_bkgd, density_postactivation) -> None:
    import jax.numpy as jnp
    import torch

    sys.meta_path.insert(0, _StubFinder())
    payload = torch.load(input_path, map_location="cpu", weights_only=False)

    state = payload["thre3d_repr"]["state_dict"]
    config = payload["thre3d_repr"]["config_dict"]
    extra = payload.get("extra_info", {})

    densities = _to_numpy(state["_densities"]).astype(np.float32)
    features = _to_numpy(state["_features"]).astype(np.float32)
    attn = _to_numpy(state["attn"]).astype(np.float32) if "attn" in state else None

    voxel_size = config.get("voxel_size")
    vs = tuple(float(v) for v in voxel_size) if voxel_size is not None else (
        3.0 / densities.shape[0],
    ) * 3
    loc_obj = config.get("grid_location")
    loc = tuple(float(v) for v in loc_obj) if isinstance(loc_obj, tuple) else (0.0, 0.0, 0.0)
    expected_scale = float(config.get("expected_density_scale", 1.0))

    from voxe_tpu.grid.voxels import (
        VoxelGrid,
        VoxelGridConfig,
        VoxelGridLocation,
        VoxelSize,
    )
    from voxe_tpu.models.volumetric import VolumetricModel
    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.utils.camera import CameraBounds

    grid = VoxelGrid(
        densities=jnp.asarray(densities),
        features=jnp.asarray(features),
        attn=jnp.asarray(attn) if attn is not None else None,
        config=VoxelGridConfig(
            voxel_size=VoxelSize(*vs),
            grid_location=VoxelGridLocation(*loc),
            density_preactivation="identity",
            density_postactivation=density_postactivation,
            expected_density_scale=expected_scale,
        ),
    )

    bounds = extra.get("camera_bounds")
    camera_bounds = (
        CameraBounds(float(bounds[0]), float(bounds[1]))
        if isinstance(bounds, (tuple, list))
        else CameraBounds(2.0 * 0.9, 6.0 * 1.1)
    )
    extra_info = {}
    for key in ("camera_bounds", "camera_intrinsics", "hemispherical_radius"):
        if key in extra:
            value = extra[key]
            extra_info[key] = (
                [float(v) for v in value] if isinstance(value, (tuple, list)) else float(value)
            )

    model = VolumetricModel(
        grid,
        SHVoxGridRenderConfig(
            num_samples_per_ray=train_num_samples_per_ray,
            camera_bounds=camera_bounds,
            white_bkgd=white_bkgd,
            render_num_samples_per_ray=render_num_samples_per_ray,
        ),
    )
    model.save(Path(output_path), extra_info=extra_info)
    print(
        f"imported {input_path} -> {output_path} "
        f"(grid {grid.grid_dims}, attn={'yes' if attn is not None else 'no'})"
    )


if __name__ == "__main__":
    main()
