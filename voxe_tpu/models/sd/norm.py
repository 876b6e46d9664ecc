"""TPU-friendly GroupNorm for NHWC activations.

flax.linen.GroupNorm reshapes [B, H, W, C] -> [B, H, W, G, C/G] to reduce per
group; on TPU that last-dim split (C/G = 10-64, far below the 128-lane tile)
forces a full relayout of every activation — profiled at ~16 ms/iter of the
SDS edit step's SD half (BENCHMARKS.md round-2 trace, "data formatting").

This module computes identical statistics with NO reshape: spatial sums
reduce the lane-aligned [B, H, W, C] tensor to [B, C], and the group
reduction/broadcast are two tiny matmuls with a constant [C, G] membership
matrix. Parameter names/shapes match flax GroupNorm ("scale"/"bias", [C]),
so converted HF checkpoints load unchanged.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class GroupNormNHWC(nn.Module):
    num_groups: int = 32
    epsilon: float = 1e-6  # flax GroupNorm default (numeric parity w/ round-1)

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        G = self.num_groups
        assert C % G == 0, (C, G)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))

        # constant group-membership matrix [C, G]
        member = np.zeros((C, G), np.float32)
        member[np.arange(C), np.repeat(np.arange(G), C // G)] = 1.0
        M = jnp.asarray(member)

        xf = x.astype(jnp.float32)
        spatial = tuple(range(1, x.ndim - 1))  # (1, 2) for NHWC
        n = float(np.prod([x.shape[a] for a in spatial]) * (C // G))
        s1 = jnp.sum(xf, axis=spatial)  # [B, C]
        s2 = jnp.sum(xf * xf, axis=spatial)  # [B, C]
        mean_g = (s1 @ M) / n  # [B, G]
        var_g = (s2 @ M) / n - mean_g * mean_g
        rstd_g = jnp.reciprocal(jnp.sqrt(var_g + self.epsilon))

        mean_c = mean_g @ M.T  # [B, C]
        rstd_c = rstd_g @ M.T
        shape = (x.shape[0],) + (1,) * len(spatial) + (C,)
        y = (xf - mean_c.reshape(shape)) * rstd_c.reshape(shape)
        y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
        return y.astype(x.dtype)
