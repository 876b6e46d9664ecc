"""Microbenchmark: alternatives for the render-backward scatter-add.

The renderer's backward accumulates per-sample cotangents into the voxel
table (8 corner scatter-adds of N=rays*samples updates into [X*Y*Z, C]).
Profiler traces show XLA's TPU scatter runs at ~15M updates/s — the whole
framework's bottleneck. Candidates measured here (host-fetch barrier; the
relay's block_until_ready does NOT actually block, so timings must drain
through a device->host copy):

  scatter_bf16 : jnp .at[].add on a bf16 table (current lowering)
  scatter_f32  : same on f32 table
  sort_segsum  : sort by index then segment_sum(indices_are_sorted=True)
  onehot_hi    : two-level — sort, then segment_sum
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def fetch_time(fn, iters, *args):
    import jax
    import numpy as np

    out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / iters


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=8_388_608, help="updates (recon: 8.4M)")
    p.add_argument("--res", type=int, default=160)
    p.add_argument("--c", type=int, default=4)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax.numpy as jnp

    N, V, C = args.n, args.res ** 3, args.c
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    idx = jax.random.randint(k1, (N,), 0, V)
    upd = jax.random.normal(k2, (N, C))

    @jax.jit
    def scatter_bf16(idx, upd):
        table = jnp.zeros((V, C), jnp.bfloat16)
        return table.at[idx].add(upd.astype(jnp.bfloat16))

    @jax.jit
    def scatter_f32(idx, upd):
        table = jnp.zeros((V, C), jnp.float32)
        return table.at[idx].add(upd)

    @jax.jit
    def sort_segsum(idx, upd):
        order = jnp.argsort(idx)
        return jax.ops.segment_sum(
            upd[order], idx[order], num_segments=V, indices_are_sorted=True
        )

    @jax.jit
    def sort_scatter(idx, upd):
        sidx = jnp.sort(idx)
        order = jnp.argsort(idx)
        table = jnp.zeros((V, C), jnp.float32)
        return table.at[sidx].add(upd[order], indices_are_sorted=True)

    for name, fn in (
        ("scatter_bf16", scatter_bf16),
        ("scatter_f32", scatter_f32),
        ("sort_segsum", sort_segsum),
        ("sort_scatter", sort_scatter),
    ):
        t0 = time.perf_counter()
        dt = fetch_time(fn, args.iters, idx, upd)
        print(
            f"{name:>14}: {dt * 1e3:9.1f} ms  ({N / dt / 1e6:8.1f} M upd/s)"
            f"  [first+timed total {time.perf_counter() - t0:.1f}s]",
            flush=True,
        )


if __name__ == "__main__":
    main()
