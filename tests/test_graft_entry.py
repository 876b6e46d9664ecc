"""Driver entry-point contract tests (single-chip jit + 8-device dryrun)."""
import importlib.util
from pathlib import Path

import jax
import pytest


@pytest.fixture(scope="module")
def graft():
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_compiles_and_runs(graft):
    fn, args = graft.entry()
    colour, depth = jax.jit(fn)(*args)
    assert colour.shape[-1] == 3 and depth.shape[-1] == 1


def test_dryrun_multichip_8(graft):
    graft.dryrun_multichip(8)
