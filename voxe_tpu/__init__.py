"""voxe_tpu — a TPU-native (JAX/XLA/Pallas) framework with the capabilities of
TAU-VAILab/Vox-E ("Text-guided Voxel Editing of 3D Objects", ICCV 2023).

This is a from-scratch rebuild, NOT a port: the scene representation is an
explicit SH voxel grid held as a JAX pytree, the volumetric renderer is a
functional, jit-compilable pipeline with fused Pallas kernels on the hot path,
the diffusion guidance (SDS) runs through a Flax Stable-Diffusion UNet, and
multi-device scaling uses `jax.sharding.Mesh` + data-parallel ray batching.

Reference layer map: /root/reference (see SURVEY.md).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("VOXE_PLATFORM"):
    # Some TPU launch environments force-register their backend and override
    # JAX_PLATFORMS (e.g. the axon sitecustomize). jax.config.update after
    # import wins, so VOXE_PLATFORM=cpu reliably pins the framework to a
    # platform for tests/debugging.
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["VOXE_PLATFORM"])
