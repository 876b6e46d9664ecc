"""Microbenchmark: the UNet's 64^2-level self-attention (the SDS step's
single largest SD-half cost).

The r4 trace (tools/trace_report.py --probe full) shows the five attn1
layers at the 64^2 level (down_0_attn_0/1, up_3_attn_0/1/2) materializing
f32[2,5,4096,4096] score tensors — ~671 MB each, ~4.7 ms/layer of pure HBM
traffic, ~23.5 ms/iter total. This tool times isolated variants of that
exact shape so the winner can be wired into CrossAttention's fast path:

  xla      — jax.nn.dot_product_attention (current fast path)
  flash    — Pallas TPU flash_attention, default block sizes (r3: slower
             inside the step; re-measured standalone here)
  flash_bN — Pallas flash with tuned BlockSizes
  bf16s    — manual einsum with bf16 scores+probs (halves the traffic,
             keeps the softmax max/sum reduction in f32)

Timing: chained dispatch train drained through one device->host fetch
(BENCHMARKS.md "measurement truth").

Run: python tools/bench_attn.py [--iters 30]
"""
from __future__ import annotations

import argparse
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--heads", type=int, default=5)
    p.add_argument("--seq", type=int, default=4096)
    p.add_argument("--dim", type=int, default=64)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    B, h, T, d = args.batch, args.heads, args.seq, args.dim
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    # BTNH layout (what CrossAttention produces before any swap)
    q = jax.random.normal(kq, (B, T, h, d), jnp.bfloat16)
    k = jax.random.normal(kk, (B, T, h, d), jnp.bfloat16)
    v = jax.random.normal(kv, (B, T, h, d), jnp.bfloat16)
    scale = 1.0 / float(np.sqrt(d))

    def xla_sdpa(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    def bf16_scores(q, k, v):
        qh, kh, vh = (x.swapaxes(-3, -2) for x in (q, k, v))  # BNTH
        s = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.bfloat16
        ) * jnp.bfloat16(scale)
        m = jnp.max(s, axis=-1, keepdims=True).astype(jnp.float32)
        e = jnp.exp(s.astype(jnp.float32) - m).astype(jnp.bfloat16)
        z = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        probs = (e.astype(jnp.float32) / z).astype(jnp.bfloat16)
        o = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        return o.swapaxes(-3, -2)

    def make_flash(block_sizes):
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention,
        )

        def f(q, k, v):
            qh, kh, vh = (x.swapaxes(-3, -2) for x in (q, k, v))  # BNTH
            o = flash_attention(qh, kh, vh, sm_scale=scale,
                                block_sizes=block_sizes)
            return o.swapaxes(-3, -2)

        return f

    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    def bs(bq, bkm, bk):
        return BlockSizes(
            block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
            block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
            block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk,
            block_q_dq=bq,
        )

    variants = {
        "xla": xla_sdpa,
        "bf16s": bf16_scores,
        "flash_default": make_flash(None),
        "flash_q512_k1024": make_flash(bs(512, 1024, 1024)),
        "flash_q1024_k2048": make_flash(bs(1024, 2048, 2048)),
        "flash_q256_k1024": make_flash(bs(256, 1024, 1024)),
        "flash_q512_k512": make_flash(bs(512, 512, 512)),
        "flash_q512_k2048": make_flash(bs(512, 2048, 2048)),
        "flash_q512_km2048_k1024": make_flash(bs(512, 2048, 1024)),
        "flash_q1024_k1024": make_flash(bs(1024, 1024, 1024)),
        "flash_q512_k4096": make_flash(bs(512, 4096, 4096)),
    }

    # correctness gate vs the XLA lowering first
    ref = np.asarray(jax.jit(xla_sdpa)(q, k, v), np.float32)
    for name, fn in variants.items():
        try:
            got = np.asarray(jax.jit(fn)(q, k, v), np.float32)
            err = float(np.max(np.abs(got - ref)))
        except Exception as exc:  # noqa: BLE001 - report and keep benching
            print(f"{name:>20}: FAILED ({type(exc).__name__}: {exc})")
            variants[name] = None
            continue
        print(f"{name:>20}: max|diff vs xla| = {err:.4f}")

    print()
    for name, fn in variants.items():
        if fn is None:
            continue
        jfn = jax.jit(fn)

        @jax.jit
        def chain(q, n_dummy=None, _f=jfn, _k=k, _v=v):
            def body(c, _):
                o = _f(c, _k, _v)
                # feed output back in as q so steps serialize
                return o.astype(c.dtype), ()

            out, _ = jax.lax.scan(body, q, None, length=args.iters)
            return out

        out = chain(q)
        np.asarray(out.ravel()[:1])  # warm + settle
        t0 = time.perf_counter()
        out = chain(q)
        np.asarray(out.ravel()[:1])
        dt = time.perf_counter() - t0
        print(f"{name:>20}: {dt / args.iters * 1e3:8.3f} ms/layer-call")


if __name__ == "__main__":
    main()
