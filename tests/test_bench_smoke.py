"""CPU smoke of bench.py's driver-recorded wiring.

The driver runs `python bench.py` on real TPU hardware at the end of every
round and records the single JSON line. These smokes execute the same code
paths at tiny config on CPU (VOXE_BENCH_SD=tiny / VOXE_BENCH_GRID /
VOXE_BENCH_BASE) so the metric's wiring — the fused K-step production
dispatch, the single-step fallback, the real-scene dataset-pose mode, and
the JSON schema — cannot bitrot between measurement sessions.
"""
import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

TINY_ENV = {
    "VOXE_PLATFORM": "cpu",
    "JAX_PLATFORMS": "cpu",
    "VOXE_BENCH_SD": "tiny",
    "VOXE_BENCH_GRID": "24",
    "VOXE_BENCH_BASE": "32",
    "VOXE_BENCH_ITERS": "2",
}


def _run_bench(env_extra, timeout=1200):
    env = dict(os.environ)
    env.update(TINY_ENV)
    env.update(env_extra)
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        capture_output=True, text=True, env=env, timeout=timeout,
        cwd=str(REPO),
    )
    assert out.returncode == 0, out.stderr[-3000:]
    # stdout must be exactly one JSON line (the driver parses it verbatim)
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, out.stdout
    rec = json.loads(lines[0])
    assert set(rec) >= {"metric", "value", "unit", "vs_baseline"}
    assert rec["value"] > 0 and rec["vs_baseline"] > 0
    return rec


def test_edit_mode_fused_k_smoke():
    """Headline mode: K fused steps/dispatch (the trainer's production
    program, make_sds_train_multi_step)."""
    rec = _run_bench({"VOXE_BENCH_K": "2"})
    assert rec["metric"] == "sds_edit_step_ms"
    assert rec["unit"] == "ms/iter"


def test_edit_mode_single_step_smoke():
    """VOXE_BENCH_K=1 restores the r2-r4 single-dispatch program."""
    rec = _run_bench({"VOXE_BENCH_K": "1"})
    assert rec["metric"] == "sds_edit_step_ms"


def test_recon_mode_fused_k_smoke():
    """Recon mode: K fused shear-warp steps/dispatch
    (make_recon_train_multi_step_shearwarp)."""
    rec = _run_bench({"VOXE_BENCH_MODE": "recon", "VOXE_BENCH_K": "2"})
    assert rec["metric"] == "recon_train_rays_per_sec_per_chip"
    assert rec["unit"] == "rays/s"


def test_edit_real_mode_smoke():
    """Real-scene recipe shape: dataset-pose fused K-step dispatch."""
    rec = _run_bench(
        {"VOXE_BENCH_MODE": "edit_real", "VOXE_BENCH_K": "2",
         "VOXE_BENCH_ITERS": "1"}
    )
    assert rec["metric"] == "sds_edit_real_step_ms"
