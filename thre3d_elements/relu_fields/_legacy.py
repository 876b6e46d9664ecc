"""Shared machinery for the legacy `thre3d_elements/relu_fields` CLIs.

The reference repo ships stale snapshots of its two oldest CLIs under
`thre3d_elements/relu_fields/` (reference:
thre3d_elements/relu_fields/train_sh_based_voxel_grid_with_posed_images.py,
.../render_sh_based_voxel_grid.py). They differ from the live CLIs only in
defaults (128^3 grid, sh_degree 2, ray_batch 16384, downsample 2.0) and in
lacking the flags added later (linear-disparity sampling, LPIPS weight,
dataset camera paths, prompt.txt output). Rather than fork a second copy of
the pipeline, we rebuild them as thin variant commands: each exposes exactly
the legacy flag surface with the legacy defaults and delegates to the modern
CLI's callback, pinning every post-legacy flag to its legacy behaviour.
"""
import copy
import importlib.util
import sys
from pathlib import Path
from typing import Any, Dict, Optional

import click

_REPO_ROOT = Path(__file__).resolve().parents[2]

# Sentinel: pin a post-legacy flag to whatever the modern CLI defaults it to.
MODERN_DEFAULT = object()


def load_modern_cli(module_name: str) -> Any:
    """Import a root-level CLI module by file path (works from any CWD)."""
    existing = sys.modules.get(module_name)
    if existing is not None:
        return existing
    if str(_REPO_ROOT) not in sys.path:  # `voxe_tpu` imports inside the CLI
        sys.path.insert(0, str(_REPO_ROOT))
    spec = importlib.util.spec_from_file_location(
        module_name, _REPO_ROOT / f"{module_name}.py"
    )
    module = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = module
    spec.loader.exec_module(module)
    return module


def make_legacy_command(
    modern_cmd: click.Command,
    *,
    name: str,
    help_text: str,
    default_overrides: Dict[str, Any],
    pinned: Dict[str, Any],
    type_overrides: Optional[Dict[str, click.ParamType]] = None,
) -> click.Command:
    """Build a legacy variant of `modern_cmd`.

    `default_overrides` — legacy defaults that differ from the modern CLI.
    `pinned` — post-legacy flags: hidden from the legacy surface and passed
    to the modern callback at the stated legacy-equivalent value.
    `type_overrides` — narrowed parameter types (e.g. the legacy camera-path
    choice set without "dataset").
    """
    type_overrides = type_overrides or {}
    pinned = {
        name: (
            next(p.default for p in modern_cmd.params if p.name == name)
            if value is MODERN_DEFAULT
            else value
        )
        for name, value in pinned.items()
    }
    params = []
    for param in modern_cmd.params:
        if param.name in pinned:
            continue
        param = copy.copy(param)
        if param.name in default_overrides:
            param.default = default_overrides[param.name]
        if param.name in type_overrides:
            param.type = type_overrides[param.name]
        params.append(param)

    def callback(**kwargs):
        return modern_cmd.callback(**{**pinned, **kwargs})

    return click.Command(name=name, params=params, callback=callback, help=help_text)
