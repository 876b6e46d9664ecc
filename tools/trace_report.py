"""Capture a jax.profiler trace of a probe program and report per-op device time.

The axon relay distorts every host-side timing EXCEPT the profiler's own
device timeline (BENCHMARKS.md "measurement truth"), so this is the ground
truth for optimization decisions. Parses the perfetto/chrome trace JSON the
profiler writes (no tensorboard/tensorflow needed).

Usage:
  python tools/trace_report.py --probe sd_half   [--frame 400 --iters 3]
  python tools/trace_report.py --probe render_grad
  python tools/trace_report.py --probe full
"""
from __future__ import annotations

import argparse
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def report(logdir: Path, top: int = 25) -> None:
    traces = sorted(logdir.rglob("*.trace.json.gz"))
    if not traces:
        print("no trace found under", logdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid lanes named like "/device:TPU:0"
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    dur_by_op = defaultdict(float)
    count_by_op = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur = float(e.get("dur", 0.0))  # microseconds
        dur_by_op[name] += dur
        count_by_op[name] += 1
        total += dur
    print(f"lanes: {sorted(set(pid_names.values()))}")
    print(f"total device-lane time: {total / 1e3:.2f} ms")
    for name, dur in sorted(dur_by_op.items(), key=lambda kv: -kv[1])[:top]:
        print(f"  {dur / 1e3:9.2f} ms  x{count_by_op[name]:<4d} {name[:110]}")

    # aggregate the same events by source line and by hlo_category (the
    # perfetto args carry both) — this is what actually names the costs
    dur_by_src = defaultdict(float)
    dur_by_cat = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        a = e.get("args") or {}
        if not a.get("hlo_category") and not a.get("source"):
            continue
        dur = float(e.get("dur", 0.0))
        src = a.get("source", "?")
        dur_by_src[src] += dur
        dur_by_cat[a.get("hlo_category", "?")] += dur
    if dur_by_src:
        print("\nby hlo_category:")
        for name, dur in sorted(dur_by_cat.items(), key=lambda kv: -kv[1])[:15]:
            print(f"  {dur / 1e3:9.2f} ms  {name}")
        print("\nby source line:")
        for name, dur in sorted(dur_by_src.items(), key=lambda kv: -kv[1])[:top]:
            print(f"  {dur / 1e3:9.2f} ms  {name}")

    # top ops WITH their perfetto args (category/source/long_name) — names
    # the shapes behind the anonymous fusion.NNNN entries above
    detail = defaultdict(lambda: [0.0, 0, {}])
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "device" not in pname.lower():
            continue
        a = e.get("args") or {}
        if not a.get("hlo_category") and not a.get("source"):
            continue
        d = detail[e.get("name", "?")]
        d[0] += float(e.get("dur", 0.0))
        d[1] += 1
        if not d[2]:
            d[2] = a
    if detail:
        print("\ntop ops (with args):")
        for name, (dur, cnt, a) in sorted(detail.items(), key=lambda kv: -kv[1][0])[:top]:
            print(f"  {dur / 1e3:9.2f} ms  x{cnt:<4d} {name}")
            for k in ("hlo_category", "source", "long_name", "tf_op", "shape"):
                if a.get(k):
                    print(f"        {k}: {str(a[k])[:220]}")


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--probe", type=str, required=True,
                   choices=["sd_half", "render_grad", "full", "refine",
                            "report_only"])
    p.add_argument("--frame", type=int, default=384,
                   help="base lattice (matches the trainers' lane-aligned "
                   "400->384 default)")
    p.add_argument("--grid", type=int, default=160)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--logdir", type=str, default="/tmp/voxe_trace")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args()

    logdir = Path(args.logdir) / args.probe
    if args.probe == "report_only":
        report(Path(args.logdir), args.top)
        return

    import jax

    from voxe_tpu.utils.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax.numpy as jnp
    import numpy as np
    import optax

    from voxe_tpu.render.interface import SHVoxGridRenderConfig
    from voxe_tpu.render.shearwarp import render_shear_warp
    from voxe_tpu.utils.camera import CameraBounds, pose_spherical

    res, frame = args.grid, args.frame
    from bench import make_dog2_grid

    grid = make_dog2_grid(res)
    render_config = SHVoxGridRenderConfig(
        num_samples_per_ray=256, camera_bounds=CameraBounds(2.0, 6.0), white_bkgd=True
    )
    pose = pose_spherical(30.0, 40.0, 4.0311)
    optimizer = optax.adam(0.03)

    def fetch(x):
        return np.asarray(x.ravel()[:1])

    if args.probe == "render_grad":
        opt_state = optimizer.init(grid)

        from voxe_tpu.render.shearwarp import _principal_branch

        sb = int(_principal_branch(-jnp.asarray(pose.rotation)[:, 2]))

        @jax.jit
        def step(g, o):
            def loss_fn(g_):
                out, _ = render_shear_warp(g_, pose, render_config,
                                           base_hw=(frame, frame),
                                           static_branch=sb)
                return jnp.mean((out.colour - 0.5) ** 2)

            grads = jax.grad(loss_fn)(g)
            updates, o2 = optimizer.update(grads, o, g)
            return optax.apply_updates(g, updates), o2

        g, o = step(grid, opt_state)
        fetch(g.densities)
        with jax.profiler.trace(str(logdir)):
            for _ in range(args.iters):
                g, o = step(g, o)
            fetch(g.densities)
    elif args.probe == "refine":
        # the trainer's fused refinement iteration at production scale —
        # SD 1.4 capture UNet + dual attn-grid update (bench.py refine mode,
        # K=1 program) — to attribute the measured ~117 ms/iter sustained
        from voxe_tpu.models.sd import StableDiffusion
        from voxe_tpu.train.refine import make_refine_iter_shearwarp

        sd = StableDiffusion(sd_version="1.4", init_mode="zeros")
        grid = grid.replace(attn=jnp.full((res, res, res, 1), -20.0))
        opt = optax.adam(0.035)
        refine_iter = make_refine_iter_shearwarp(
            sd, render_config, opt, opt, grid, (frame, frame),
            timestamp=200, attn_tv_weight=0.001,
        )
        text = sd.get_text_embeds("a render of a dog wearing a party hat, front view", "")
        idxs = jnp.arange(1, 9, dtype=jnp.int32)
        emask = jnp.asarray(np.array([0, 0, 0, 0, 0, 0, 0, 1], np.float32))
        omask = 1.0 - emask
        rot = jnp.asarray(pose.rotation)
        trans = jnp.asarray(pose.translation).reshape(3, 1)
        e_attn, o_attn = grid.attn, grid.attn
        oe, oo = opt.init(e_attn), opt.init(o_attn)

        def call(e, o, oe, oo, key):
            e, o, oe, oo, _ = refine_iter(
                e, o, oe, oo, sd.params, text, rot, trans, idxs, emask, omask, key
            )
            return e, o, oe, oo

        e_attn, o_attn, oe, oo = call(e_attn, o_attn, oe, oo, jax.random.PRNGKey(0))
        fetch(e_attn)
        with jax.profiler.trace(str(logdir)):
            for i in range(args.iters):
                e_attn, o_attn, oe, oo = call(
                    e_attn, o_attn, oe, oo, jax.random.PRNGKey(i + 1)
                )
            fetch(e_attn)
    else:
        from voxe_tpu.models.sd import StableDiffusion
        from voxe_tpu.train.sds import make_sds_train_step_shearwarp

        sd = StableDiffusion(sd_version="2.0", init_mode="zeros")
        text = sd.get_text_embeds("a dog made of yarn, front view", "")
        if args.probe == "sd_half":
            @jax.jit
            def half(img):
                def loss_fn(img_):
                    return sd.sds_loss(sd.params, text, img_, jax.random.PRNGKey(0),
                                       jnp.asarray(500), 100.0)

                return img - 1e-6 * jax.grad(loss_fn)(img)

            img = jnp.zeros((1, frame, frame, 3))
            img = half(img)
            fetch(img)
            with jax.profiler.trace(str(logdir)):
                for _ in range(args.iters):
                    img = half(img)
                fetch(img)
        else:  # full
            step = make_sds_train_step_shearwarp(
                sd, render_config, optimizer, (frame, frame),
                density_correlation_weight=200.0,
            )
            opt_state = optimizer.init(grid)
            ref_d = jnp.copy(grid.densities)
            ref_f = jnp.copy(grid.features)
            g, o, _ = step(grid, opt_state, sd.params, text,
                           jnp.asarray(pose.rotation),
                           jnp.asarray(pose.translation).reshape(3, 1),
                           ref_d, ref_f, jax.random.PRNGKey(0), jnp.asarray(500))
            fetch(g.densities)
            with jax.profiler.trace(str(logdir)):
                for _ in range(args.iters):
                    g, o, _ = step(g, o, sd.params, text,
                                   jnp.asarray(pose.rotation),
                                   jnp.asarray(pose.translation).reshape(3, 1),
                                   ref_d, ref_f, jax.random.PRNGKey(0),
                                   jnp.asarray(500))
                fetch(g.densities)

    report(logdir, args.top)


if __name__ == "__main__":
    main()
