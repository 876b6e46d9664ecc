"""CLI flag parity against the reference's six entry points.

Statically extracts every `@click.option` (long name + literal default) from
the reference CLIs (/root/reference/<name>.py) and from ours, and asserts

  1. every reference flag exists here, and
  2. every SHARED flag has the identical literal default

(reference SURVEY.md 2.17-2.20: "identical flags and output layout"). Extra
TPU-native flags are allowed but must be in the documented allowlist below so
new extras are added consciously, not by accident. AST-based on purpose: the
reference CLIs import wandb/cc3d/cudnn at module scope and cannot be imported
in this environment.
"""
import ast
from pathlib import Path

import pytest

REFERENCE = Path("/root/reference")
REPO = Path(__file__).resolve().parent.parent

CLIS = [
    "train_sh_based_voxel_grid_with_posed_images",
    "edit_pretrained_relu_field",
    "refine_edited_relu_field",
    "segment_attn_relu_field",
    "render_sh_based_voxel_grid",
    "render_sh_based_voxel_grid_attn",
]

# TPU-native extras, all documented in PARITY.md / --help text
ALLOWED_EXTRA = {
    "train_sh_based_voxel_grid_with_posed_images": {
        "coarse_stages_on_cpu", "gather_dtype", "multihost", "num_devices",
        "resume", "shear_warp_base_res", "steps_per_call", "use_fused_kernel",
        "use_shear_warp",
    },
    "edit_pretrained_relu_field": {
        "multihost", "num_devices", "sd_refine_weights_dir", "sd_version",
        "sd_weights_dir", "shear_warp_base_res", "steps_per_call",
        "use_shear_warp",
    },
    "refine_edited_relu_field": {
        "multihost", "num_devices", "sd_version", "sd_weights_dir",
        "shear_warp_base_res", "steps_per_call", "use_shear_warp",
    },
    "segment_attn_relu_field": set(),
    "render_sh_based_voxel_grid": {"use_shear_warp"},
    "render_sh_based_voxel_grid_attn": {
        "sd_version", "sd_weights_dir", "use_shear_warp",
    },
}

pytestmark = pytest.mark.skipif(
    not REFERENCE.exists(), reason="reference checkout not available"
)


def _click_options(path: Path):
    """{long_flag_name: literal_default_or_'<expr>'} from @click.option."""
    tree = ast.parse(path.read_text())
    out = {}
    for node in ast.walk(tree):
        if not isinstance(node, ast.FunctionDef):
            continue
        for dec in node.decorator_list:
            if not (
                isinstance(dec, ast.Call)
                and isinstance(dec.func, ast.Attribute)
                and dec.func.attr == "option"
            ):
                continue
            longs = [
                a.value
                for a in dec.args
                if isinstance(a, ast.Constant)
                and isinstance(a.value, str)
                and a.value.startswith("--")
            ]
            if not longs:
                continue
            default = None
            for kw in dec.keywords:
                if kw.arg == "default":
                    try:
                        default = ast.literal_eval(kw.value)
                    except ValueError:
                        default = "<expr>"
            out[longs[0].lstrip("-")] = default
    return out


@pytest.mark.parametrize("cli", CLIS)
def test_cli_flags_match_reference(cli):
    ref = _click_options(REFERENCE / f"{cli}.py")
    ours = _click_options(REPO / f"{cli}.py")
    assert ref, f"no reference options parsed for {cli}"

    missing = sorted(set(ref) - set(ours))
    assert not missing, f"{cli}: reference flags missing here: {missing}"

    undocumented_extra = sorted(set(ours) - set(ref) - ALLOWED_EXTRA[cli])
    assert not undocumented_extra, (
        f"{cli}: new extra flags {undocumented_extra} — add deliberately to "
        "ALLOWED_EXTRA and document in PARITY.md"
    )

    default_diffs = {
        k: (ref[k], ours[k]) for k in set(ref) & set(ours) if ref[k] != ours[k]
    }
    assert not default_diffs, f"{cli}: default mismatches: {default_diffs}"


# --- legacy thre3d_elements/relu_fields snapshots (SURVEY 2.24) -------------
#
# Our legacy CLIs are built at runtime (thin variants of the modern commands,
# thre3d_elements/relu_fields/_legacy.py), so parity is checked against the
# LIVE click command rather than by AST.

LEGACY_CLIS = ["train_sh_based_voxel_grid_with_posed_images",
               "render_sh_based_voxel_grid"]


def _load_legacy(cli):
    import importlib.util

    path = REPO / "thre3d_elements" / "relu_fields" / f"{cli}.py"
    spec = importlib.util.spec_from_file_location(f"legacy_{cli}", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module


@pytest.mark.parametrize("cli", LEGACY_CLIS)
def test_legacy_cli_flags_match_reference_snapshot(cli):
    ref = _click_options(REFERENCE / "thre3d_elements" / "relu_fields" / f"{cli}.py")
    assert ref, f"no reference options parsed for legacy {cli}"
    legacy = _load_legacy(cli)

    def _norm(default):
        # click >= 8.2 marks "no default" with a Sentinel; AST reads None
        return None if default.__class__.__name__ == "Sentinel" else default

    ours = {
        p.name: _norm(p.default)
        for p in legacy.main.params
        if any(o.startswith("--") for o in p.opts)
    }

    missing = sorted(set(ref) - set(ours))
    assert not missing, f"legacy {cli}: reference flags missing here: {missing}"

    # extras beyond the legacy surface must also be post-legacy reference
    # flags we deliberately kept hidden=pinned, or documented TPU extras —
    # here we simply require NO extras: the legacy surface is exact.
    extra = sorted(set(ours) - set(ref))
    assert not extra, f"legacy {cli}: extra flags {extra}"

    default_diffs = {
        k: (ref[k], ours[k]) for k in set(ref) & set(ours) if ref[k] != ours[k]
    }
    assert not default_diffs, f"legacy {cli}: default mismatches: {default_diffs}"


@pytest.mark.parametrize("cli", LEGACY_CLIS)
def test_legacy_cli_help_renders(cli):
    from click.testing import CliRunner

    result = CliRunner().invoke(_load_legacy(cli).main, ["--help"])
    assert result.exit_code == 0, result.output
    assert "Legacy" in result.output
