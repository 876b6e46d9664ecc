"""Shear-warp volumetric renderer — the TPU-native fast path.

The reference's per-sample formulation (gather 8 voxel corners per ray sample,
scatter-add gradients back; thre3d_atom/thre3d_reprs/voxels.py:306-342) is the
right design for CUDA atomics but catastrophically wrong for TPU: XLA's TPU
scatter runs at ~12M updates/s, making the render backward 8 x 0.5-2.5 s per
step (BENCHMARKS.md "measurement truth"). This module re-derives the renderer
as a Lacroute-Levoy perspective shear-warp factorization instead:

* The volume is marched slice-by-slice along its principal axis. For parallel
  slice planes, all slice->base-plane homographies are pure axis-aligned
  scales about the epipole, so each slice resample is SEPARABLE: two small
  banded interpolation matrices contracted on the MXU (einsum), built densely
  from the traced camera geometry.
* Per-(base-pixel, slice) radiance/density then feeds the SAME compositing
  code as the exact renderer (accumulate.py), preserving tone mapping, white
  background, and the Beer-Lambert weights.
* The backward is transposed matmuls + elementwise math: NO gather or scatter
  anywhere in the training step.

The rendered image lives on the BASE PLANE (the volume slice nearest the
eye): a genuine pinhole image from the same center of projection, related to
any conventional screen image by one 2D homography (`screen_to_base`). The
training paths consume base-plane images directly (SDS feeds them to SD;
recon warps the TARGET instead — data, no gradient); exact screen-space
renders remain the job of the reference-parity renderer.

Quadrature difference vs the exact renderer: samples lie ON the grid's voxel-
center planes (R slices) instead of uniformly in t, and the final sample uses
the slice spacing rather than an infinite far delta. Both discretize the same
continuous field; parity is established statistically in
tests/test_shearwarp.py.
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from voxe_tpu.grid.voxels import ACTIVATIONS, VoxelGrid
from voxe_tpu.render.accumulate import (
    accumulate_radiance_density_on_rays,
    safe_disparity,
)
from voxe_tpu.render.interface import RenderOut
from voxe_tpu.render.rays import Rays
from voxe_tpu.parallel.mesh import shard_axis
from voxe_tpu.render.sh import evaluate_spherical_harmonics
from voxe_tpu.utils.camera import CameraIntrinsics, CameraPose
from voxe_tpu.utils.constants import (
    EXTRA_ACCUMULATED_WEIGHTS,
    EXTRA_DISPARITY,
    INFINITY,
    NUM_COLOUR_CHANNELS,
)

# the 6 (axis, direction) marching permutations: each maps world axes
# (0, 1, 2) -> (a, b, k) with k the marching axis; flips make marching go
# toward +k with the eye below slice 0
_PERMS = ((1, 2, 0), (2, 0, 1), (0, 1, 2))


class BaseImageGeometry(NamedTuple):
    """Traced geometry of the base-plane image (all world-space)."""

    eye: jnp.ndarray  # [3] camera center
    # dirs/t_slices are None on compute_base_geometry results (host-side
    # geometry never materializes them); the traced render fills both
    dirs: Optional[jnp.ndarray]  # [U*V, 3] unit ray dir per base pixel
    t_slices: Optional[jnp.ndarray]  # internal-only (branch-dependent shape)
    lo: jnp.ndarray  # [2] base window lower corner (grid coords, a/b)
    hi: jnp.ndarray  # [2]
    perm_index: jnp.ndarray  # [] int32: which of the 6 marching branches ran


def lane_aligned_res(n: int, tol: float = 0.10) -> int:
    """Round a base-lattice side to the nearest multiple of 128 when that
    changes it by <= `tol` (else return it unchanged).

    TPU tiled layouts pack the minormost dimension in lanes of 128; with a
    base width V that is not a multiple of 128 every [S, U, V] -> [S, U*V]
    flatten in the streamed compositing path is a physical retile (the
    reshape discards the per-row lane padding), measured at ~5.7 ms/iter of
    "data formatting" in the dog2 render backward. At V % 128 == 0 the
    flatten is a free bitcast: the SDS edit step measured 56.5 -> 52.8
    ms/iter moving the default base 400 -> 384 (BENCHMARKS.md r4). The base
    lattice is this framework's internal quadrature (the reference has no
    such concept); callers that pass an explicit --shear_warp_base_res keep
    it exactly.
    """
    m = max(128, int(round(n / 128.0)) * 128)
    return m if abs(m - n) <= tol * n else n


def _principal_branch(view_dir: jnp.ndarray) -> jnp.ndarray:
    """view_dir [3] (world) -> branch index in [0, 6): axis * 2 + (dir > 0)."""
    axis = jnp.argmax(jnp.abs(view_dir))
    positive = (view_dir[axis] > 0.0).astype(jnp.int32)
    return axis.astype(jnp.int32) * 2 + positive


# world->canonical permutation matrices, one per marching axis:
# canonical_vec = _PERM_MATS[axis] @ world_vec, and (permutations being
# orthogonal) world_vec = canonical_vec @ _PERM_MATS[axis]. Gathering the
# [3, 3] matrix by a TRACED axis index turns the axis permutation into
# arithmetic — the cubic-grid fast path's replacement for three statically
# permuted code branches.
_PERM_MATS_NP = [
    [[1.0 if _PERMS[axis][c] == w else 0.0 for w in range(3)] for c in range(3)]
    for axis in range(3)
]


def _flip_sel(flip, when_flipped, when_not):
    """Select between two marching-direction variants: `flip` may be a Python
    bool (static 6-branch path: free) or a traced scalar (cubic fast path:
    one fused select)."""
    if isinstance(flip, bool):
        return when_flipped if flip else when_not
    return jnp.where(flip, when_flipped, when_not)


def _interp_matrices(src: jnp.ndarray, size: int) -> jnp.ndarray:
    """src [S, U] continuous grid coords -> [S, U, size] hat-function weights
    (linear interpolation with zero padding outside [0, size-1])."""
    p = jnp.arange(size, dtype=src.dtype)
    return jnp.maximum(0.0, 1.0 - jnp.abs(src[..., None] - p))


def _streamed_composite(
    vol: jnp.ndarray,  # [S, A, B, C+1] pre-activated (features..., density)
    Wa: jnp.ndarray,  # [S, U, A] f32 hat weights
    Wb: jnp.ndarray,  # [S, V, B]
    t_sn: jnp.ndarray,  # [S, N] depth of each slice crossing
    dirs: jnp.ndarray,  # [N, 3] unit ray dirs (world order)
    inside_sn: jnp.ndarray,  # [S, N] bool in-volume mask
    grid_config,
    white_bkgd: bool,
    background_value: float,
    with_diffuse: bool,
    mesh,
    slice_block: int = None,
    flip_k: bool = False,
    num_shade_channels: int = None,
    noise_std: float = 0.0,
    key=None,
    diffuse_only: bool = False,
):
    """Slice-streamed resample + composite: the [N, S, C] radiance tensor is
    never materialized in HBM.

    The monolithic formulation resamples ALL slices into a [U*V, S, C+1]
    tensor (512 MB f32 at dog2 shapes) that round-trips HBM through shading,
    compositing, and again in the backward — the dominant cost of the render
    half (BENCHMARKS.md r2 bisection; VERDICT r2 next-1a). Streamed version:

      pass 1  resample the DENSITY channel only ([N, S] — 16x smaller),
              compute the compositing weights via the exp(-cumsum) identity
              (accumulate.py:133-143).
      pass 2  accumulate colour block-by-block over slices; each block's
              resample+shade+weighted-sum is wrapped in jax.checkpoint so the
              backward RECOMPUTES the block resample (cheap MXU matmuls)
              instead of saving [N, S, C] residuals.

    Every per-sample tensor is kept SLICE-MAJOR ([S, N] / [S, U, V, C]) —
    the natural output layout of the per-slice resample matmuls. The earlier
    pixel-major ([N, S]) formulation forced XLA to materialize transposes of
    each [U, V, S(, C)] block in forward AND backward: 6.2 ms/iter of pure
    "data formatting" out of a 13.6 ms render step in the r3 profiler trace.
    Slice-major keeps the compositing einsums ("sn,st->tn" scan,
    "sn,snc->nc" colour reduction) transpose-free; only [N]-shaped outputs
    (colour, depth, acc) leave in pixel order.

    Numerics match the monolithic path exactly: same einsum dtypes/accumulation,
    same weights math. The radiance -INFINITY outside-mask is realized as a
    zeroed colour contribution inside shade_block (sigmoid(-INF) == 0):
    without density noise the masked density already forces w_s = 0 on those
    samples, but with `noise_std > 0` outside samples regain nonzero weights
    and the zero-padded resampled features must not shade into the composite.
    """
    if slice_block is None:
        slice_block = int(os.environ.get("VOXE_SW_BLOCK", "32"))
    S, A, B, C1 = vol.shape
    _, U, _ = Wa.shape
    V = Wb.shape[1]
    N = U * V
    dt = vol.dtype
    f_post = ACTIVATIONS[grid_config.feature_postactivation]
    d_post = ACTIVATIONS[grid_config.density_postactivation]

    # ---- pass 1: density-only resample -> weights
    dens_pre = vol[..., -1]  # [S, A, B]
    tmp_d = jnp.einsum(
        "sua,sab->sub", Wa.astype(dt), dens_pre,
        preferred_element_type=jnp.float32,
    ).astype(dt)  # [S, U, B]
    if mesh is not None:
        tmp_d = shard_axis(mesh, tmp_d, axis=1)
    dens_rs = jnp.einsum(
        "svb,sub->suv", Wb.astype(dt), tmp_d,
        preferred_element_type=jnp.float32,
    )  # [S, U, V] f32 (slice-major: no output transpose)
    if mesh is not None:
        dens_rs = shard_axis(mesh, dens_rs, axis=1)  # DP over base rows (u)
    dens = d_post(dens_rs).reshape(S, N)
    dens = jnp.where(inside_sn, dens, 0.0)
    if noise_std > 0.0:  # reference accumulate.py:59-63 (post-mask, like the
        # exact path where process masks and accumulate then noises)
        assert key is not None, "density noise requires a PRNG key"
        # drawn [N, S] in MARCHING order — the monolithic path's exact draw
        # (accumulate.py:89-94), so streamed==monolithic holds bitwise per
        # sample under noise; the transpose to slice-major only exists when
        # the (recon-only, default-off) noise knob is active
        noise = jax.random.normal(key, (N, S), dens.dtype) * noise_std
        # dens is in VOLUME slice order here; the monolithic path flips
        # the volume so its noise lands in MARCHING order — reverse the
        # draw so noise[:, s] attaches to the same physical slice
        noise = _flip_sel(flip_k, noise[:, ::-1], noise)
        dens = dens + noise.T

    # weights via the exp(-cumsum) identity (accumulate.py:133-143); unit ray
    # dirs => no dir-norm scaling; final delta = slab spacing.
    # The cumulative sum over S is computed as a matmul against a constant
    # [S, S] triangular matrix: XLA's native cumsum lowering is a
    # pad(160->256)/reshape/blocked-scan chain costing ~5 ms/iter fwd+bwd at
    # dog2 shapes (r3 full-step trace), while the triangular contraction is
    # one 8 GFLOP MXU pass whose backward is the transposed matmul.
    #
    # `flip_k`: the s axis runs in VOLUME source order while the eye is
    # beyond slice S-1, i.e. marching order is s descending. Accumulation
    # direction is just the matrix orientation (tril instead of triu), the
    # last marching sample is s=0, and deltas come from the preceding
    # (larger-s... smaller-index) neighbour — this is what lets negative
    # marching branches skip the [S, A, B, C] volume reverse (and its
    # backward) entirely.
    dd = t_sn[1:] - t_sn[:-1]  # [S-1, N]; with flip_k, t descends: dd < 0
    deltas = _flip_sel(
        flip_k,
        -jnp.concatenate([dd[:1], dd], axis=0),
        jnp.concatenate([dd, dd[-1:]], axis=0),
    )  # [S, N]
    x = dens * deltas  # [S, N] per-sample optical thickness
    # VOXE_SW_TRI_BF16=1 runs the [S,S]x[S,N] triangular contraction with
    # bf16 inputs / f32 accumulation on bf16 volumes. Measured NEGATIVE
    # on-chip (r5 A/B, BENCHMARKS.md): 53.29 vs 52.57 ms/iter for the full
    # SDS step — the x-cast pass costs more than the MXU-rate win, because
    # the fusion is HBM-bound on its exp()/weights epilogue, not MXU-bound
    # on the 7.5-GFLOP contraction. Default stays f32 (also numerically
    # safer: weights = exp(-opt)*(exp(x)-1) >= 0 holds either way, but the
    # f32 path keeps transmittance exact to accumulation order).
    mm_dt = (
        jnp.bfloat16
        if dt == jnp.bfloat16
        and os.environ.get("VOXE_SW_TRI_BF16", "0") == "1"
        else jnp.float32
    )
    ones_ss = jnp.ones((S, S), mm_dt)
    tri = _flip_sel(flip_k, jnp.tril(ones_ss), jnp.triu(ones_ss))
    optical = jnp.einsum(
        "st,sn->tn", tri, x.astype(mm_dt), preferred_element_type=jnp.float32
    )  # inclusive optical depth along the marching direction
    t_incl = jnp.exp(-optical)
    t_excl = jnp.exp(x - optical)  # exclusive sum = inclusive - x
    weights = t_excl - t_incl  # [S, N]
    acc_render = 1.0 - _flip_sel(flip_k, t_incl[:1], t_incl[-1:]).reshape(N, 1)

    # ---- pass 2: blockwise weighted shading
    feats_pre = vol[..., :-1]  # [S, A, B, C1-1]
    if num_shade_channels is not None:  # multi-channel attn path
        num_channels = num_shade_channels
    else:
        num_channels = NUM_COLOUR_CHANNELS if C1 > 2 else 1
    n_coeffs = (C1 - 1) // num_channels
    sh_degree = int(math.isqrt(n_coeffs)) - 1
    w_dt = weights.astype(dt)
    dirs_b = dirs[None, :, :]  # [1, N, 3] broadcasts through SH over slices

    def shade_block(vol_b, Wa_b, Wb_b, w_b, in_b):
        # vol_b [Sb, A, B, Cf]; Wa_b [Sb, U, A]; Wb_b [Sb, V, B]; w_b [Sb, N]
        # in_b [Sb, N] in-window mask
        tmp = jnp.einsum(
            "sua,sabc->subc", Wa_b.astype(dt), vol_b,
            preferred_element_type=jnp.float32,
        ).astype(dt)
        if mesh is not None:
                tmp = shard_axis(mesh, tmp, axis=1)
        res = jnp.einsum(
            "svb,subc->suvc", Wb_b.astype(dt), tmp,
            preferred_element_type=jnp.float32,
        )  # [Sb, U, V, Cf] f32-accumulated (slice-major: no output transpose)
        if mesh is not None:
                res = shard_axis(mesh, res, axis=1)
        Sb = vol_b.shape[0]
        feats = f_post(res.astype(dt)).reshape(Sb, N, num_channels, n_coeffs)
        shade_degree = 0 if diffuse_only else sh_degree
        raw_rad = evaluate_spherical_harmonics(
            degree=shade_degree,
            sh_coeffs=feats[..., :1] if diffuse_only else feats,
            viewdirs=dirs_b,
        )  # [Sb, N, C]
        # outside-window radiance mask (process.py:78-85 parity, realized as
        # sigmoid(-INF) == 0 colour): with density noise active the masked
        # density no longer guarantees w_s == 0 outside the window, so the
        # zero-padded resampled features must not shade into the composite
        colour_b = jnp.where(in_b[..., None], jax.nn.sigmoid(raw_rad), 0.0)
        out = jnp.einsum(
            "sn,snc->nc", w_b, colour_b, preferred_element_type=jnp.float32
        )
        if with_diffuse:
            if sh_degree == 0:
                # degree 0 IS diffuse — the full shading above already
                # evaluated exactly this; skip the duplicate SH pass
                return out, out
            diff_rad = evaluate_spherical_harmonics(
                degree=0, sh_coeffs=feats[..., :1], viewdirs=dirs_b
            )
            diff_col = jnp.where(in_b[..., None], jax.nn.sigmoid(diff_rad), 0.0)
            out_d = jnp.einsum(
                "sn,snc->nc", w_b, diff_col,
                preferred_element_type=jnp.float32,
            )
            return out, out_d
        return out, None

    shade_block = jax.checkpoint(shade_block)
    colour_render = jnp.zeros((N, num_channels), jnp.float32)
    diffuse_render = jnp.zeros((N, num_channels), jnp.float32) if with_diffuse else None
    for start in range(0, S, slice_block):
        stop = min(S, start + slice_block)
        c_b, d_b = shade_block(
            feats_pre[start:stop],
            Wa[start:stop],
            Wb[start:stop],
            w_dt[start:stop],
            inside_sn[start:stop],
        )
        colour_render = colour_render + c_b
        if with_diffuse:
            diffuse_render = diffuse_render + d_b

    if white_bkgd:
        bg = (1.0 - acc_render) * background_value
        colour_render = colour_render + bg
        if with_diffuse:
            diffuse_render = diffuse_render + bg

    depth_render = jnp.sum(t_sn * weights, axis=0).reshape(N, 1)
    disparity_render = safe_disparity(depth_render, acc_render)
    extra = {
        EXTRA_DISPARITY: disparity_render,
        EXTRA_ACCUMULATED_WEIGHTS: acc_render,
    }
    if with_diffuse:
        extra["diffuse_colour"] = diffuse_render
    return RenderOut(colour=colour_render, depth=depth_render, extra=extra)


def _render_canonical(
    vol: jnp.ndarray,  # [S, A, B, C+1] pre-activated (features..., density)
    eye_g: jnp.ndarray,  # [3] eye in (a, b, k) grid coords; eye_k < 0
    voxel_sizes_g: jnp.ndarray,  # [3] world units per voxel along (a, b, k)
    aabb_lo_g: jnp.ndarray,  # [3] world coords of voxel center (0, 0, 0)
    base_hw: Tuple[int, int],
    config,
    grid_config,
    key,
    with_diffuse: bool = False,
    mesh=None,
    background_value: float = 1.0,
    axis_order: Tuple[int, int, int] = (0, 1, 2),
    stream_composite: bool = True,
    flip_k: bool = False,
    num_shade_channels: int = None,
    diffuse_only: bool = False,
    unpermute_mat: jnp.ndarray = None,
):
    """Core shear-warp in canonical orientation. Returns (RenderOut over
    [U*V] base pixels, geometry pieces; ray directions in WORLD axis order).

    `axis_order` = (a_ax, b_ax, k_ax): which world axis each canonical axis
    is (static 6-branch path); the cubic fast path instead passes
    `unpermute_mat` (a traced [3, 3] permutation with world = canonical @ M)
    and a TRACED `flip_k`, so one trace covers all marching orientations.
    Ray directions are un-permuted to world order BEFORE spherical-
    harmonics evaluation — SH coefficients are world-frame, so evaluating
    them with canonical-ordered components silently corrupts view-dependent
    radiance for sh_degree >= 1 on non-z marching branches."""
    S, A, B, _ = vol.shape
    U, V = base_hw
    f = jnp.float32

    e_a, e_b, e_k = eye_g[0], eye_g[1], eye_g[2]
    # guard: keep the eye strictly below slice 0 (cameras orbit outside the
    # volume in every supported config; clamp only protects the math)
    e_k = jnp.minimum(e_k, -0.5)

    # τ_j: expansion of base coords onto slice j (τ_0 = 1)
    j = jnp.arange(S, dtype=f)
    tau = (j - e_k) / (0.0 - e_k)  # [S] >= 1

    # base window: cover slice 0 and the far-slice footprint projected onto
    # the base plane (projection toward the eye shrinks by 1/τ about e_ab)
    a_corners = jnp.array([0.0, A - 1.0], f)
    b_corners = jnp.array([0.0, B - 1.0], f)
    far = tau[-1]
    a_proj = e_a + (a_corners - e_a) / far
    b_proj = e_b + (b_corners - e_b) / far
    lo = jnp.stack(
        [jnp.minimum(a_corners.min(), a_proj.min()),
         jnp.minimum(b_corners.min(), b_proj.min())]
    )
    hi = jnp.stack(
        [jnp.maximum(a_corners.max(), a_proj.max()),
         jnp.maximum(b_corners.max(), b_proj.max())]
    )

    # base pixel centers (grid coords on the base plane)
    alpha = lo[0] + (jnp.arange(U, dtype=f) + 0.5) * (hi[0] - lo[0]) / U  # [U]
    beta = lo[1] + (jnp.arange(V, dtype=f) + 0.5) * (hi[1] - lo[1]) / V  # [V]

    # per-slice source coords + separable interpolation matrices. With
    # flip_k (streamed negative-direction marching) the per-slice arrays are
    # built in VOLUME source order — tau reversed — so the big volume tensor
    # itself never needs reversing; only these [S]-row matrices do.
    tau_o = _flip_sel(flip_k, tau[::-1], tau)  # slice-index order of `vol`
    src_a = e_a + (alpha[None, :] - e_a) * tau_o[:, None]  # [S, U]
    src_b = e_b + (beta[None, :] - e_b) * tau_o[:, None]  # [S, V]
    Wa = _interp_matrices(src_a, A)  # [S, U, A]
    Wb = _interp_matrices(src_b, B)  # [S, V, B]

    # world-space rays through base pixels (canonical a/b/k components)
    w_a, w_b, w_k = voxel_sizes_g[0], voxel_sizes_g[1], voxel_sizes_g[2]
    pa = aabb_lo_g[0] + alpha * w_a  # [U] world a-coord on base plane
    pb = aabb_lo_g[1] + beta * w_b
    eye_w = jnp.stack(
        [aabb_lo_g[0] + e_a * w_a, aabb_lo_g[1] + e_b * w_b,
         aabb_lo_g[2] + e_k * w_k]
    )
    va = (pa[:, None] - eye_w[0]) * jnp.ones((1, V))  # [U, V]
    vb = (pb[None, :] - eye_w[1]) * jnp.ones((U, 1))
    vk = jnp.full((U, V), aabb_lo_g[2] - eye_w[2])
    v = jnp.stack([va, vb, vk], axis=-1).reshape(U * V, 3)  # base-plane offset
    v_norm = jnp.linalg.norm(v, axis=-1)
    dirs = v / v_norm[:, None]  # canonical (a, b, k) component order
    # un-permute to world axis order
    if unpermute_mat is not None:
        # traced-axis path: a [N, 3] x [3, 3] matmul against the gathered
        # permutation matrix — axis choice as arithmetic, not branching
        dirs = dirs @ unpermute_mat.astype(dirs.dtype)
    else:
        # static slices — integer-array indexing would lower to gather
        inv = [0, 0, 0]
        for i, ax in enumerate(axis_order):
            inv[ax] = i
        dirs = jnp.stack(
            [dirs[:, inv[0]], dirs[:, inv[1]], dirs[:, inv[2]]], axis=1
        )

    # outside-AABB masking (process.py:78-85 parity): without it the
    # zero-padded PRE-activation density turns into softplus(0) fog
    in_a = (src_a >= -0.5) & (src_a <= A - 0.5)  # [S, U]
    in_b = (src_b >= -0.5) & (src_b <= B - 0.5)  # [S, V]

    if stream_composite:
        # slice-major layouts throughout (see _streamed_composite docstring):
        # both the mask and the slice depths are BUILT [S, N] — never
        # materialized pixel-major and transposed
        inside_sn = (in_a[:, :, None] & in_b[:, None, :]).reshape(S, U * V)
        t_sn = tau_o[:, None] * v_norm[None, :]  # [S, U*V]
        out = _streamed_composite(
            vol, Wa, Wb, t_sn, dirs, inside_sn, grid_config,
            config.white_bkgd, background_value, with_diffuse, mesh,
            flip_k=flip_k, num_shade_channels=num_shade_channels,
            noise_std=getattr(config, "stochastic_density_noise_std", 0.0),
            key=key, diffuse_only=diffuse_only,
        )
        # the geometry tuple's t_slices leg has no consumer on the streamed
        # path (render_shear_warp drops it before the lax.switch boundary)
        return out, (eye_w, dirs, None, lo, hi)

    # depth of each slice crossing: t_j = |v| * τ_j (slice-index order)
    t_slices = v_norm[:, None] * tau_o[None, :]  # [U*V, S]

    # ---- monolithic fallback (exact-parity experiments / fused kernel):
    # resample every slice onto the base pixel lattice: two MXU contractions.
    # bf16 grids: cast the hat weights to the volume dtype so the contraction
    # runs on the bf16 MXU path (mixed f32xbf16 einsum silently promotes the
    # whole matmul to f32); accumulate f32 (preferred_element_type)
    dt = vol.dtype
    tmp = jnp.einsum(
        "sua,sabc->subc", Wa.astype(dt), vol,
        preferred_element_type=jnp.float32,
    ).astype(dt)  # [S, U, B, C+1]
    if mesh is not None:
        tmp = shard_axis(mesh, tmp, axis=1)  # DP over base rows (u)
    resampled = jnp.einsum(
        "svb,subc->uvsc", Wb.astype(dt), tmp,
        preferred_element_type=jnp.float32,
    )  # [U, V, S, C+1]
    if mesh is not None:
        resampled = shard_axis(mesh, resampled, axis=0)
    C1 = resampled.shape[-1]
    # f32 accumulation output from the einsum; the DENSITY channel stays f32
    # through the weights math, the RADIANCE channels drop back to the volume
    # dtype (bf16 fast path) — sigmoid/shading/colour-sum at half the HBM
    # traffic, with the colour reduction f32-accumulated in accumulate.py
    resampled = resampled.reshape(U * V, S, C1)

    # activations AFTER interpolation (grid_query parity, voxels.py:194-218)
    cfg = grid_config
    f_post = ACTIVATIONS[cfg.feature_postactivation]
    d_post = ACTIVATIONS[cfg.density_postactivation]
    feats = f_post(resampled[..., :-1].astype(dt))
    dens = d_post(resampled[..., -1])  # [N, S] f32

    inside = in_a[:, :, None] & in_b[:, None, :]  # [S, U, V]
    inside = jnp.transpose(inside, (1, 2, 0)).reshape(U * V, S, 1)
    dens = jnp.where(inside[..., 0], dens, 0.0)

    if num_shade_channels is not None:  # multi-channel attn path
        num_channels = num_shade_channels
    else:
        num_channels = NUM_COLOUR_CHANNELS if C1 > 2 else 1  # attn path: 1 ch
    sh_coeffs = feats.reshape(U * V, S, num_channels, -1)
    sh_degree = int(math.isqrt(sh_coeffs.shape[-1])) - 1
    if diffuse_only:  # shade colour AS the degree-0 diffuse version
        sh_degree, sh_coeffs = 0, sh_coeffs[..., :1]
    raw_radiance = evaluate_spherical_harmonics(
        degree=sh_degree,
        sh_coeffs=sh_coeffs,
        # [N, 1, 3] broadcasts through the SH polynomials — never materialize
        # the [N, S, 3] repeat
        viewdirs=dirs[:, None, :],
    )
    raw_radiance = jnp.where(
        inside, raw_radiance, jnp.asarray(-INFINITY, raw_radiance.dtype)
    )

    rays_c = Rays(origins=jnp.broadcast_to(eye_w, (U * V, 3)), directions=dirs)
    out = accumulate_radiance_density_on_rays(
        (raw_radiance, dens),
        t_slices,
        rays_c,
        stochastic_density_noise_std=getattr(
            config, "stochastic_density_noise_std", 0.0
        ),
        white_bkgd=config.white_bkgd,
        background_value=background_value,
        key=key,
        # the final slice uses the real slab spacing, not the exact
        # renderer's infinite far delta — the volume ends at the far face
        final_delta="slab",
        use_fused_kernel=getattr(config, "use_fused_kernel", False),
    )
    if with_diffuse:
        # diffuse regularization render (reference process.py render_diffuse:
        # SH degree 0 shading of the same field) from the SAME resample pass
        diffuse_radiance = evaluate_spherical_harmonics(
            degree=0,
            sh_coeffs=sh_coeffs[..., :1],
            viewdirs=dirs[:, None, :],
        )
        diffuse_radiance = jnp.where(
            inside, diffuse_radiance, jnp.asarray(-INFINITY, diffuse_radiance.dtype)
        )
        out_diff = accumulate_radiance_density_on_rays(
            (diffuse_radiance, dens),
            t_slices,
            rays_c,
            # same key as the specular composite -> same noise draw, so the
            # diffuse regularizer sees the identical (noised) density field
            stochastic_density_noise_std=getattr(
                config, "stochastic_density_noise_std", 0.0
            ),
            white_bkgd=config.white_bkgd,
            background_value=background_value,
            key=key,
            final_delta="slab",
            use_fused_kernel=getattr(config, "use_fused_kernel", False),
        )
        out = RenderOut(
            colour=out.colour,
            depth=out.depth,
            extra={**out.extra, "diffuse_colour": out_diff.colour},
        )
    return out, (eye_w, dirs, t_slices, lo, hi)


def render_shear_warp(
    voxel_grid: VoxelGrid,
    pose: CameraPose,
    config,
    base_hw: Tuple[int, int] = (256, 256),
    key=None,
    with_diffuse: bool = False,
    mesh=None,
    attn_mode: bool = False,
    use_orig_densities: bool = False,
    background_value: float = 1.0,
    static_branch: int = None,
    stream_composite: bool = True,
    diffuse_only: bool = False,
) -> Tuple[RenderOut, BaseImageGeometry]:
    """Render the base-plane image of `voxel_grid` seen from `pose`.

    Returns (RenderOut with [U*V, ...] leaves, BaseImageGeometry). Gradients
    flow to the grid through matmuls only — no gather/scatter.

    `attn_mode` renders the grid's attention channel(s) as the feature(s)
    — the shear-warp twin of render_sh_voxel_grid_attn (grid_query_attn
    semantics: voxels.py:221-246); pass background_value=0.0 to composite on
    black as the reference does (accumulate.py:161-166). The attn field may
    carry MULTIPLE channels ([X, Y, Z, C]); each composites independently
    (deg-0 shading) against the shared density field, so e.g. the dual
    edit/object attention grids of the refinement stage render in ONE pass —
    the pose-dependent resample matrices and the transmittance scan are
    computed once instead of per grid.

    `stream_composite` (default) uses the slice-streamed resample+composite
    (_streamed_composite) — identical numerics, no [N, S, C] HBM round-trip.
    The monolithic path remains for the Pallas fused-kernel experiment and
    A/B benchmarking.
    """
    if getattr(config, "use_fused_kernel", False):
        stream_composite = False  # the Pallas kernel lives on the monolithic path
    assert not (with_diffuse and diffuse_only), (
        "with_diffuse renders BOTH spec+diffuse; diffuse_only renders the "
        "deg-0 version AS the colour — pick one"
    )
    cfg = voxel_grid.config
    d_pre = ACTIVATIONS[cfg.density_preactivation]
    f_pre = ACTIVATIONS[cfg.feature_preactivation]
    if attn_mode:
        assert voxel_grid.attn is not None, "grid has no attn channel"
        dens_src = voxel_grid.densities
        if use_orig_densities:
            assert voxel_grid.orig_densities is not None
            dens_src = voxel_grid.orig_densities
        pre_density = d_pre(dens_src * cfg.expected_density_scale)
        pre_features = f_pre(voxel_grid.attn)
        num_shade_channels = int(voxel_grid.attn.shape[-1])
    else:
        pre_density = d_pre(voxel_grid.densities * cfg.expected_density_scale)
        pre_features = f_pre(voxel_grid.features)
        num_shade_channels = None
    unified = jnp.concatenate([pre_features, pre_density], axis=-1)
    if cfg.gather_dtype == "bfloat16":
        unified = unified.astype(jnp.bfloat16)

    dims = jnp.array(voxel_grid.grid_dims, jnp.float32)
    vsizes = jnp.array(list(voxel_grid.config.voxel_size), jnp.float32)
    # world coords of voxel center (0,0,0): grid centered at grid_location
    loc = jnp.array(list(cfg.grid_location), jnp.float32)
    aabb_lo = loc - (dims - 1.0) / 2.0 * vsizes

    eye_w = jnp.asarray(pose.translation, jnp.float32).reshape(3)
    # central view direction: camera -z in world coords
    rot = jnp.asarray(pose.rotation, jnp.float32)
    view_dir = -rot[:, 2]
    branch = _principal_branch(view_dir)

    grid_dims = tuple(int(d) for d in voxel_grid.grid_dims)
    if (
        static_branch is None
        and stream_composite
        and len(set(grid_dims)) == 1
        # A/B kill-switch for benchmarking the 6-way static path
        and os.environ.get("VOXE_SW_UNIBRANCH", "1") == "1"
    ):
        # CUBIC fast path (the default trainers' case): the six marching
        # branches collapse to ONE trace. A conditional in the compiled step
        # is a fusion barrier — XLA materializes every operand/result at the
        # branch boundary and cannot fuse the banded-matmul resample,
        # transmittance scan, and shading with the surrounding program; the
        # r4 trace attributed 7.9 ms/iter of the dog2 SDS step to exactly
        # this (VERDICT r4 next-3; the loop it replaces is the reference's
        # per-sample marcher, thre3d_atom/thre3d_reprs/voxels.py:306-342).
        # With equal dims every axis permutation has the SAME shapes, so:
        #   - axis choice: gather a [3, 3] permutation matrix by the traced
        #     axis index — all geometry becomes matmul/where arithmetic —
        #     and a minimal 3-way switch holding ONLY the volume transpose;
        #   - marching direction: traced `flip_k` selects (tril/triu,
        #     delta orientation, tau order) inside the one trace.
        # branch (line above the if) already encodes axis * 2 + (dir > 0):
        # derive from it so the tie-breaking rule has ONE traced source of
        # truth that the host-side guards mirror (_principal_branch)
        axis_t = branch // 2
        positive = (branch % 2) == 1
        M = jnp.asarray(_PERM_MATS_NP, jnp.float32)[axis_t]  # [3, 3]
        vs = M @ vsizes
        lo3 = M @ aabb_lo
        S_k = float(grid_dims[0])
        # march toward -k: the canonical k axis runs opposite world k — the
        # lo face moves to the far side and the k voxel size flips sign
        lo3 = lo3.at[2].set(
            jnp.where(positive, lo3[2], lo3[2] + (S_k - 1.0) * vs[2])
        )
        vs = vs.at[2].set(jnp.where(positive, vs[2], -vs[2]))
        eye_g = (M @ eye_w - lo3) / vs
        volp = jax.lax.switch(
            axis_t,
            [
                lambda u: u,  # _PERMS[0] = (1, 2, 0): already (k, a, b)
                lambda u: jnp.transpose(u, (1, 2, 0, 3)),
                lambda u: jnp.transpose(u, (2, 0, 1, 3)),
            ],
            unified,
        )
        out, (_eye_c, dirs_w, _t, lo2, hi2) = _render_canonical(
            volp, eye_g, vs, lo3, base_hw, config, cfg, key,
            with_diffuse=with_diffuse, mesh=mesh,
            background_value=background_value,
            stream_composite=True,
            flip_k=jnp.logical_not(positive),
            num_shade_channels=num_shade_channels,
            diffuse_only=diffuse_only,
            unpermute_mat=M,
        )
        geom = BaseImageGeometry(
            eye=eye_w, dirs=dirs_w, t_slices=None, lo=lo2, hi=hi2,
            perm_index=axis_t * 2 + positive.astype(jnp.int32),
        )
        return out, geom

    def make_branch(axis: int, positive: bool):
        a_ax, b_ax, k_ax = _PERMS[axis]

        def run(operands):
            unified_, eye_w_, key_ = operands
            volp = jnp.transpose(unified_, (k_ax, a_ax, b_ax, 3))
            vs = jnp.stack([vsizes[a_ax], vsizes[b_ax], vsizes[k_ax]])
            lo3 = jnp.stack([aabb_lo[a_ax], aabb_lo[b_ax], aabb_lo[k_ax]])
            dimp = jnp.stack([dims[a_ax], dims[b_ax], dims[k_ax]])
            if not positive:  # march toward -k: flip the k axis
                if not stream_composite:
                    # monolithic path: materialize the reversed volume. The
                    # streamed path instead reverses the [S]-row weight
                    # matrices and flips the triangular-scan orientation
                    # (flip_k) — the [S, A, B, C] reverse and its backward
                    # (~1.4 ms/iter at dog2 shapes, r3 trace) never run.
                    volp = volp[::-1]
                lo3 = lo3.at[2].set(lo3[2] + (dimp[2] - 1.0) * vs[2])
                vs = vs.at[2].set(-vs[2])
            eye_g = (jnp.stack([eye_w_[a_ax], eye_w_[b_ax], eye_w_[k_ax]]) - lo3) / vs
            out, (eye_o, dirs_w, t_slices, lo2, hi2) = _render_canonical(
                volp, eye_g, vs, lo3, base_hw, config, cfg, key_,
                with_diffuse=with_diffuse, mesh=mesh,
                background_value=background_value,
                axis_order=(a_ax, b_ax, k_ax),
                stream_composite=stream_composite,
                flip_k=stream_composite and not positive,
                num_shade_channels=num_shade_channels,
                diffuse_only=diffuse_only,
            )
            # t_slices shape is [N, dims[k_ax]] — branch-DEPENDENT for
            # non-cubic grids, so it must not cross the lax.switch boundary
            # (switch requires identical output types); it has no external
            # consumers (geometry exposes lo/hi/perm only)
            return out, dirs_w, lo2, hi2

        return run

    branches = [
        make_branch(axis, positive)
        for axis in range(3)
        for positive in (False, True)
    ]
    if static_branch is not None:
        # fixed-pose callers (profiling, single-view tools): skip the
        # 6-way lax.switch and trace the one branch inline so per-op device
        # time is visible in profiler timelines
        out, dirs_w, lo2, hi2 = branches[static_branch]((unified, eye_w, key))
        branch = jnp.asarray(static_branch, jnp.int32)
    else:
        out, dirs_w, lo2, hi2 = jax.lax.switch(
            branch, branches, (unified, eye_w, key)
        )
    geom = BaseImageGeometry(
        eye=eye_w, dirs=dirs_w, t_slices=None, lo=lo2, hi=hi2,
        perm_index=branch,
    )
    return out, geom


def orient_base_image(img: jnp.ndarray, rotation: jnp.ndarray) -> jnp.ndarray:
    """Orient a base-plane image ([U, V, C] or [U, V]) to the camera's
    up/right frame with axis-aligned ops only (transpose + flips).

    The base lattice's axes are grid axes (a_ax, b_ax) of the marching
    branch, so the raw frame can be a mirror image or rotated ~90 deg
    relative to an upright camera view. SD scores orientation-sensitive
    content ("front view", asymmetric prompts) — feed it frames whose rows
    run down the camera's -up and whose columns run along camera right.
    Square images may transpose; non-square images only flip (the residual
    90-degree error is impossible to fix shape-preservingly).

    Differentiable (pure permutations); traced rotation; used by the SDS and
    refinement shear-warp paths on the frames SD consumes and on the attn
    renders compared against SD's (equally oriented) attention maps.
    """
    U, V = img.shape[0], img.shape[1]
    branch = _principal_branch(-rotation[:, 2])
    axis = branch // 2
    perms = jnp.asarray(_PERMS)  # [3, 3]
    A = jax.nn.one_hot(perms[axis, 0], 3, dtype=rotation.dtype)  # row axis
    B = jax.nn.one_hot(perms[axis, 1], 3, dtype=rotation.dtype)  # col axis
    right, up = rotation[:, 0], rotation[:, 1]
    a_r, b_r = A @ right, B @ right
    a_u, b_u = A @ up, B @ up

    do_t = jnp.abs(a_r) > jnp.abs(b_r)  # row axis more horizontal: transpose
    if U == V:
        img = jnp.where(do_t, jnp.swapaxes(img, 0, 1), img)
        row_up = jnp.where(do_t, b_u, a_u)
        col_right = jnp.where(do_t, a_r, b_r)
    else:
        row_up, col_right = a_u, b_r
    img = jnp.where(row_up > 0, img[::-1], img)  # rows must run down (-up)
    img = jnp.where(col_right < 0, img[:, ::-1], img)
    return img


def shear_warp_pose_margins(
    voxel_grid: VoxelGrid,
    eyes: np.ndarray,  # [N, 3] world-space camera centers
    view_dirs: np.ndarray,  # [N, 3] central view directions (camera -z, world)
) -> np.ndarray:
    """Host-side (NumPy): per-pose margin, in voxels, by which each eye sits
    OUTSIDE the grid AABB along its marching axis.

    The shear-warp factorization requires the eye strictly before slice 0
    along the marching axis (e_k < 0 in grid coords); `_render_canonical`
    clamps `e_k = min(e_k, -0.5)` to keep the traced math finite, which
    SILENTLY renders wrong geometry for any pose whose true margin is below
    0.5 voxels (VERDICT r4 weak-1). Callers use this to detect such poses
    host-side and route them to the exact per-sample renderer (which, like
    the reference's ray-AABB slab test, sample.py:71-184, handles arbitrary
    eyes) or fail loudly.

    Margin definition: for the pose's marching branch (dominant |view_dir|
    axis k, marching toward sign(view_dir[k])), the distance from the eye to
    the NEAR grid face along k, in voxels; >= 0.5 means the traced clamp is a
    no-op and the rendered geometry is trustworthy.
    """
    eyes = np.asarray(eyes, np.float64).reshape(-1, 3)
    view_dirs = np.asarray(view_dirs, np.float64).reshape(-1, 3)
    all_m = _all_axis_margins(voxel_grid, eyes, view_dirs)  # [N, 3]
    k = np.argmax(np.abs(view_dirs), axis=1)  # [N] marching axis
    return np.take_along_axis(all_m, k[:, None], axis=1)[:, 0]


def _all_axis_margins(
    voxel_grid: VoxelGrid, eyes: np.ndarray, view_dirs: np.ndarray
) -> np.ndarray:
    """[N, 3] eye-outside-AABB margin (in voxels) along EVERY axis, marching
    toward sign(view_dirs[axis]): toward +k the eye must clear the LOW face,
    toward -k the HIGH one. shear_warp_pose_margins selects the actual
    marching (argmax) axis; check_shear_warp_hemisphere additionally checks
    every NEAR-TIE axis so a dominant-axis switch between lattice samples
    cannot hide a violating sliver."""
    cfg = voxel_grid.config
    dims = np.array(voxel_grid.grid_dims, np.float64)
    vsizes = np.array(list(cfg.voxel_size), np.float64)
    loc = np.array(list(cfg.grid_location), np.float64)
    aabb_lo = loc - (dims - 1.0) / 2.0 * vsizes
    aabb_hi = loc + (dims - 1.0) / 2.0 * vsizes
    return np.where(
        view_dirs > 0.0, (aabb_lo - eyes) / vsizes, (eyes - aabb_hi) / vsizes
    )


def shear_warp_supports_pose(
    voxel_grid: VoxelGrid, pose: CameraPose, min_margin: float = 0.5
) -> bool:
    """True when `pose`'s eye clears the grid AABB along its marching axis by
    >= `min_margin` voxels (host-side; see shear_warp_pose_margins)."""
    eye = np.asarray(pose.translation, np.float64).reshape(1, 3)
    view = -np.asarray(pose.rotation, np.float64)[:, 2].reshape(1, 3)
    return bool(shear_warp_pose_margins(voxel_grid, eye, view)[0] >= min_margin)


def check_shear_warp_poses(
    voxel_grid: VoxelGrid,
    poses: np.ndarray,  # [N, 3, 4] stacked camera-to-world poses
    context: str,
    min_margin: float = 0.5,
) -> None:
    """Raise ValueError when ANY pose puts the camera inside (or within
    `min_margin` voxels of) the grid AABB along its marching axis.

    Trainers call this once per pose set before compiling a shear-warp
    training program — the alternative is the silent e_k clamp corrupting
    every affected frame for the whole run."""
    poses = np.asarray(poses, np.float64)
    eyes = poses[:, :, 3]
    views = -poses[:, :, 2]
    margins = shear_warp_pose_margins(voxel_grid, eyes, views)
    bad = np.flatnonzero(margins < min_margin)
    if bad.size:
        worst = int(bad[np.argmin(margins[bad])])
        raise ValueError(
            f"{context}: {bad.size}/{len(poses)} camera pose(s) sit inside or "
            f"within {min_margin} voxels of the voxel grid's AABB along their "
            f"marching axis (worst: pose {worst}, margin "
            f"{margins[worst]:.2f} voxels) — the shear-warp fast path cannot "
            "render from inside the volume. Re-run with the exact renderer "
            "(--use_shear_warp false / use_shear_warp=False), shrink "
            "--grid_world_size, or move the cameras outside the grid."
        )


def check_shear_warp_hemisphere(
    voxel_grid: VoxelGrid,
    radius: float,
    context: str,
    min_margin: float = 0.5,
) -> None:
    """Raise ValueError when SOME hemisphere pose at `radius` (pitch in
    [15, 90], yaw in [0, 360) — the `get_random_pose` domain) would put the
    camera inside the grid AABB along its marching axis.

    Checks a dense pitch/yaw lattice with a Lipschitz slack: the eye moves at
    most `radius` world units per radian, so along any FIXED axis the true
    minimum margin is at least the sampled minimum minus
    radius * h * sqrt(2) / min_voxel_size voxels for lattice spacing h.
    Because the MARCHING axis itself switches discontinuously at |v_a|=|v_b|
    ties, the per-sample margin is taken as the min over every axis that
    could be dominant anywhere in the sample's lattice cell (the view
    direction moves at most h*sqrt(2) radians per cell, so any axis within
    2*h*sqrt(2) of the max |component| is a candidate) — a sub-cell sliver
    with a different marching axis can then never evade the check."""
    h_deg = 0.25
    h = math.radians(h_deg)
    pitch = np.radians(np.arange(15.0, 90.0 + h_deg, h_deg))
    yaw = np.radians(np.arange(0.0, 360.0, h_deg))
    sp, cp = np.sin(pitch), np.cos(pitch)
    sy, cy = np.sin(yaw), np.cos(yaw)
    # eye(yaw, pitch) = r * (sy*sp, -cy*sp, cp)  (pose_spherical composition)
    eyes = np.empty((len(pitch), len(yaw), 3))
    eyes[..., 0] = radius * sp[:, None] * sy[None, :]
    eyes[..., 1] = -radius * sp[:, None] * cy[None, :]
    eyes[..., 2] = radius * cp[:, None] * np.ones((1, len(yaw)))
    eyes = eyes.reshape(-1, 3)
    views = -eyes / radius  # spherical poses look at the origin
    all_m = _all_axis_margins(voxel_grid, eyes, views)  # [N, 3]
    absv = np.abs(views)
    tie_slack = 2.0 * h * math.sqrt(2.0)
    candidate = absv >= absv.max(axis=1, keepdims=True) - tie_slack
    margins = np.where(candidate, all_m, np.inf).min(axis=1)
    vs_min = float(min(voxel_grid.config.voxel_size))
    slack = radius * h * math.sqrt(2.0) / vs_min
    if float(margins.min()) - slack < min_margin:
        raise ValueError(
            f"{context}: random hemisphere poses at radius {radius:.4f} can "
            f"put the camera inside (or within {min_margin} voxels of) the "
            f"voxel grid's AABB along the marching axis (min sampled margin "
            f"{margins.min():.2f} voxels, lattice slack {slack:.2f}) — the "
            "shear-warp fast path cannot render from inside the volume. "
            "Re-run with the exact renderer (--use_shear_warp false / "
            "use_shear_warp=False), shrink --grid_world_size, or increase "
            "the camera radius."
        )


def compute_base_geometry(
    voxel_grid: VoxelGrid,
    pose: CameraPose,
) -> BaseImageGeometry:
    """Host-side (NumPy) base-window geometry for `pose` WITHOUT rendering.

    The geometry (lo/hi window + branch) depends only on grid and pose —
    NOT on the base lattice resolution, so it can be shared across lattice
    sizes.

    Mirrors the branch selection and window math of `_render_canonical` /
    `render_shear_warp` exactly (tested against the traced path in
    tests/test_shearwarp.py) so target images can be warped to base-plane
    space once per dataset, before training. `dirs`/`t_slices` are not
    materialized (None) — `screen_to_base` needs only lo/hi/perm_index."""
    cfg = voxel_grid.config
    dims = np.array(voxel_grid.grid_dims, np.float64)
    vsizes = np.array(list(cfg.voxel_size), np.float64)
    loc = np.array(list(cfg.grid_location), np.float64)
    aabb_lo = loc - (dims - 1.0) / 2.0 * vsizes

    eye_w = np.asarray(pose.translation, np.float64).reshape(3)
    rot = np.asarray(pose.rotation, np.float64)
    view_dir = -rot[:, 2]
    axis = int(np.argmax(np.abs(view_dir)))
    positive = int(view_dir[axis] > 0.0)
    branch = axis * 2 + positive
    a_ax, b_ax, k_ax = _PERMS[axis]

    vs = np.array([vsizes[a_ax], vsizes[b_ax], vsizes[k_ax]])
    lo3 = np.array([aabb_lo[a_ax], aabb_lo[b_ax], aabb_lo[k_ax]])
    dimp = np.array([dims[a_ax], dims[b_ax], dims[k_ax]])
    if not positive:
        lo3[2] += (dimp[2] - 1.0) * vs[2]
        vs[2] = -vs[2]
    eye_g = (np.array([eye_w[a_ax], eye_w[b_ax], eye_w[k_ax]]) - lo3) / vs

    S, A, B = int(dimp[2]), int(dimp[0]), int(dimp[1])
    e_a, e_b = eye_g[0], eye_g[1]
    e_k = min(eye_g[2], -0.5)
    far = (S - 1.0 - e_k) / (0.0 - e_k)
    a_corners = np.array([0.0, A - 1.0])
    b_corners = np.array([0.0, B - 1.0])
    a_proj = e_a + (a_corners - e_a) / far
    b_proj = e_b + (b_corners - e_b) / far
    lo = np.array(
        [min(a_corners.min(), a_proj.min()), min(b_corners.min(), b_proj.min())],
        np.float32,
    )
    hi = np.array(
        [max(a_corners.max(), a_proj.max()), max(b_corners.max(), b_proj.max())],
        np.float32,
    )
    return BaseImageGeometry(
        eye=jnp.asarray(eye_w, jnp.float32),
        dirs=None,
        t_slices=None,
        lo=jnp.asarray(lo),
        hi=jnp.asarray(hi),
        perm_index=jnp.asarray(branch, jnp.int32),
    )


def screen_to_base(
    pose: CameraPose,
    intrinsics: CameraIntrinsics,
    geom: BaseImageGeometry,
    voxel_grid: VoxelGrid,
    base_hw: Tuple[int, int],
):
    """[H, W, 2] fractional base-pixel coords of every screen pixel.

    Used to pull TARGET images (data, no gradient) into base-plane space so
    photometric losses can be computed against shear-warp renders, and to
    compare shear-warp output against the exact screen-space renderer.
    """
    from voxe_tpu.render.rays import cast_rays

    cfg = voxel_grid.config
    dims = np.array(voxel_grid.grid_dims, np.float32)
    vsizes = np.array(list(cfg.voxel_size), np.float32)
    loc = np.array(list(cfg.grid_location), np.float32)
    aabb_lo = loc - (dims - 1.0) / 2.0 * vsizes

    rays = cast_rays(
        intrinsics,
        jnp.asarray(pose.rotation),
        jnp.asarray(pose.translation),
    )
    d = rays.directions.reshape(-1, 3)
    o = rays.origins.reshape(-1, 3)

    U, V = base_hw
    axis = geom.perm_index // 2
    positive = geom.perm_index % 2
    perms = jnp.array(_PERMS)  # [3][a, b, k]
    a_ax, b_ax, k_ax = perms[axis][0], perms[axis][1], perms[axis][2]

    vs = jnp.array(vsizes)[jnp.stack([a_ax, b_ax, k_ax])]
    lo3 = jnp.array(aabb_lo)[jnp.stack([a_ax, b_ax, k_ax])]
    dimp = jnp.array(dims)[jnp.stack([a_ax, b_ax, k_ax])]
    neg = (positive == 0)
    lo3 = jnp.where(
        neg, lo3.at[2].set(lo3[2] + (dimp[2] - 1.0) * vs[2]), lo3
    )
    vs = jnp.where(neg, vs.at[2].set(-vs[2]), vs)

    sel = jnp.stack([a_ax, b_ax, k_ax])
    d_g = d[:, sel] / vs  # direction in grid coords
    o_g = (o[:, sel] - lo3) / vs
    # intersect base plane k = 0 (grid coords)
    t = (0.0 - o_g[:, 2]) / d_g[:, 2]
    a0 = o_g[:, 0] + t * d_g[:, 0]
    b0 = o_g[:, 1] + t * d_g[:, 1]
    # continuous base-pixel index
    ui = (a0 - geom.lo[0]) / (geom.hi[0] - geom.lo[0]) * U - 0.5
    vi = (b0 - geom.lo[1]) / (geom.hi[1] - geom.lo[1]) * V - 0.5
    behind = t <= 0.0  # plane behind the camera: mark invalid
    ui = jnp.where(behind, -10.0, ui)
    vi = jnp.where(behind, -10.0, vi)
    return jnp.stack([ui, vi], axis=-1).reshape(
        intrinsics.height, intrinsics.width, 2
    )


def warp_image_to_base(
    image: jnp.ndarray,  # [H, W, C] screen-space image (data)
    coords: jnp.ndarray,  # [H, W, 2] from screen_to_base
    base_hw: Tuple[int, int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat a screen image onto the base lattice with bilinear weights.

    Returns (base image [U, V, C], weight mask [U, V]). Pure data preparation
    (stop-gradient); the scatter here runs on the TARGET side only, outside
    the training step's gradient path, and only when a new frame is drawn.
    """
    U, V = base_hw
    H, W, C = image.shape
    ui = coords[..., 0].reshape(-1)
    vi = coords[..., 1].reshape(-1)
    px = image.reshape(-1, C)

    u0 = jnp.floor(ui).astype(jnp.int32)
    v0 = jnp.floor(vi).astype(jnp.int32)
    acc = jnp.zeros((U * V, C))
    wacc = jnp.zeros((U * V,))
    for du in (0, 1):
        for dv in (0, 1):
            uu, vv = u0 + du, v0 + dv
            w = jnp.maximum(0.0, 1.0 - jnp.abs(ui - uu)) * jnp.maximum(
                0.0, 1.0 - jnp.abs(vi - vv)
            )
            valid = (uu >= 0) & (uu < U) & (vv >= 0) & (vv < V)
            w = jnp.where(valid, w, 0.0)
            flat = jnp.clip(uu, 0, U - 1) * V + jnp.clip(vv, 0, V - 1)
            acc = acc.at[flat].add(w[:, None] * px)
            wacc = wacc.at[flat].add(w)
    base = acc / jnp.maximum(wacc, 1e-8)[:, None]
    return base.reshape(U, V, C), (wacc > 1e-6).reshape(U, V).astype(jnp.float32)


def sample_base_image(
    base: jnp.ndarray,  # [U, V, C] composited base-plane image
    coords: jnp.ndarray,  # [H, W, 2] from screen_to_base
    fill: float = 0.0,
) -> jnp.ndarray:
    """Bilinear GATHER of a base-plane image at per-screen-pixel coords —
    the final 2D warp of the Lacroute-Levoy factorization. Screen pixels
    whose rays miss the base window (or look away from the base plane,
    coords < 0 sentinel from `screen_to_base`) blend toward `fill`.

    Eval-only: 4 gathers per screen pixel (H*W*4 total), never on a
    training path — training supervises in base space precisely to keep
    gathers out of the gradient program.
    """
    U, V, C = base.shape
    ui = coords[..., 0]
    vi = coords[..., 1]
    u0 = jnp.floor(ui).astype(jnp.int32)
    v0 = jnp.floor(vi).astype(jnp.int32)
    out = jnp.zeros((*ui.shape, C), base.dtype)
    wsum = jnp.zeros(ui.shape, base.dtype)
    for du in (0, 1):
        for dv in (0, 1):
            uu, vv = u0 + du, v0 + dv
            w = jnp.maximum(0.0, 1.0 - jnp.abs(ui - uu)) * jnp.maximum(
                0.0, 1.0 - jnp.abs(vi - vv)
            )
            valid = (uu >= 0) & (uu < U) & (vv >= 0) & (vv < V)
            w = jnp.where(valid, w, 0.0).astype(base.dtype)
            corner = base[jnp.clip(uu, 0, U - 1), jnp.clip(vv, 0, V - 1)]
            out = out + w[..., None] * corner
            wsum = wsum + w
    return out + (1.0 - wsum)[..., None] * jnp.asarray(fill, base.dtype)


def render_shear_warp_to_screen(
    voxel_grid: VoxelGrid,
    pose: CameraPose,
    intrinsics: CameraIntrinsics,
    config,
    base_hw: Tuple[int, int] = None,
    key=None,
    mesh=None,
    attn_mode: bool = False,
    use_orig_densities: bool = False,
    background_value: float = None,
) -> RenderOut:
    """Fast SCREEN-SPACE render: shear-warp base composite + the final 2D
    warp (`sample_base_image` at `screen_to_base` coords). Completes the
    classic factorization for user-facing output (turntable videos,
    previews): ~R banded-matmul slice resamples on the MXU + H*W*4 gathers,
    instead of H*W*S*8 gathers on the exact path.

    Returns RenderOut with [H, W, C] leaves (matches
    VolumetricModel.render's reshaped layout). The exact per-sample
    renderer remains the parity/eval reference; this path trades its
    uniform-t quadrature for slice-aligned quadrature (same statistical
    parity bound as the training fast path, tests/test_shearwarp.py).

    `base_hw` defaults to a square lattice at 2x the screen's long side —
    the same oversampling the recon trainer uses (measured +6.1 dB; the
    base window spans the whole grid diagonal, so a 1x lattice
    undersamples the object).
    """
    if base_hw is None:
        side = 2 * max(int(intrinsics.height), int(intrinsics.width))
        base_hw = (side, side)
    if background_value is None:
        background_value = (
            0.0 if attn_mode else (1.0 if config.white_bkgd else 0.0)
        )
    # exact-path semantics: config.render_diffuse renders colour AS the
    # degree-0 diffuse version (interface.py:46, process.py:37) — shaded
    # ONCE via diffuse_only (the full-SH composite would be discarded)
    render_diffuse = bool(getattr(config, "render_diffuse", False)) and (
        not attn_mode
    )
    out, geom = render_shear_warp(
        voxel_grid,
        pose,
        config,
        base_hw=base_hw,
        key=key,
        mesh=mesh,
        attn_mode=attn_mode,
        use_orig_densities=use_orig_densities,
        background_value=background_value,
        diffuse_only=render_diffuse,
    )
    coords = screen_to_base(pose, intrinsics, geom, voxel_grid, base_hw)
    as_base = lambda t: t.reshape(*base_hw, -1).astype(jnp.float32)
    colour = sample_base_image(
        as_base(out.colour), coords, fill=background_value
    )
    depth = sample_base_image(as_base(out.depth), coords, fill=0.0)
    extra = {
        k: sample_base_image(as_base(v), coords, fill=0.0)
        for k, v in out.extra.items()
    }
    return RenderOut(colour=colour, depth=depth, extra=extra)
