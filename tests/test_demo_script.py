"""CI dry-run of the unattended weights-ready demo pipeline (VERDICT r2 #8).

Runs bash_scripts/run_demo_when_weights_ready.sh with TINY=1 — the IDENTICAL
script path the real unattended run takes (recon -> global edit -> local edit
+ refinement -> turntable renders -> metrics gate), at plumbing scale with the
hash tokenizer and random tiny-SD weights. If a flag or output filename in the
script rots, this test fails.
"""
import os
import subprocess
from pathlib import Path

from voxe_tpu.data.synthetic import generate_synthetic_scene

REPO = Path(__file__).resolve().parent.parent


def test_weights_ready_demo_script_tiny(tmp_path):
    scene = generate_synthetic_scene(
        tmp_path / "scene", num_train=4, num_test=1, image_size=48,
        focal=48.0, grid_res=16,
    )
    # the TINY leg uses a single-folder dataset layout
    (scene / "camera_params.json").write_bytes(
        (scene / "train_camera_params.json").read_bytes()
    )
    out_root = tmp_path / "out"
    env = dict(os.environ, TINY="1", VOXE_PLATFORM="cpu")
    proc = subprocess.run(
        ["bash", str(REPO / "bash_scripts" / "run_demo_when_weights_ready.sh"),
         str(scene), str(out_root)],
        env=env, capture_output=True, text=True, timeout=3000,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-3000:]
    # every stage left its artifact
    assert (out_root / "ref/saved_models/model_final.pth").exists()
    assert (out_root / "yarn/saved_models/model_final.pth").exists()
    assert (out_root / "party_hat/saved_models/model_final_refined.pth").exists()
    assert (out_root / "renders/ref/rendered_video.mp4").exists()
    assert (out_root / "renders/yarn/rendered_video.mp4").exists()
    assert (out_root / "renders/party_hat/rendered_video.mp4").exists()
