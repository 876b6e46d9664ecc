"""Largest-connected-component (SCC) post-processing of edited grids.

Rebuild of reference: edit_pretrained_relu_field.py:374-427 — binarize the
edited density grid at 0, find the 26-connected components, and revert every
voxel outside the LARGEST component back to the reference (pre-edit) density.
"""
from __future__ import annotations

import numpy as np

from voxe_tpu.seg.native import largest_k
from voxe_tpu.utils.logging import log


def scc_post_process(
    densities: np.ndarray,  # [X, Y, Z, 1] edited raw densities
    ref_densities: np.ndarray,  # [X, Y, Z, 1] pre-edit raw densities
    k: int = 10,
    connectivity: int = 26,
) -> np.ndarray:
    """Returns the post-processed density grid (reference :381-390)."""
    binary = (densities[..., 0] > 0).astype(np.uint8)
    labels, num = largest_k(binary, k=k, connectivity=connectivity)
    log.info(f"SCC post-process: {num} components; keeping the largest")
    out = densities.copy()
    # the largest component carries label k (cc3d.largest_k convention used at
    # reference :389: `orig_d[aa != 10] = reg_d[aa != 10]` with k=10)
    mask = labels != k
    out[mask] = ref_densities[mask]
    return out
