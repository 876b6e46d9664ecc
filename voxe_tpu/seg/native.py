"""Build + load the native (C++) segmentation backend via ctypes.

The reference pulls PyMaxflow and cc3d from pip (both C++ wheels,
requirements.txt:23,26); this framework carries its own C++ sources in
native/ and compiles them on first use with g++ (cached as a .so next to the
sources). No pybind11 needed — plain C ABI + ctypes.
"""
from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libvoxeseg.so"
_SOURCES = ["maxflow.cpp", "bk_maxflow.cpp", "components.cpp"]

_lib = None


def _build() -> None:
    # compile to a process-unique temp file and os.replace (atomic on the
    # same filesystem): concurrent first-use builds (multichip dryrun
    # subprocess, multi-host SPMD processes sharing a checkout) must never
    # CDLL a partially written .so
    import os

    tmp_path = _LIB_PATH.with_suffix(f".so.tmp.{os.getpid()}")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        *[str(_NATIVE_DIR / s) for s in _SOURCES],
        "-o", str(tmp_path),
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except subprocess.CalledProcessError as e:
        tmp_path.unlink(missing_ok=True)
        raise RuntimeError(
            f"native build failed ({' '.join(cmd)}):\n{e.stderr}"
        ) from e
    os.replace(tmp_path, _LIB_PATH)


def get_lib() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    sources_mtime = max((_NATIVE_DIR / s).stat().st_mtime for s in _SOURCES)
    if not _LIB_PATH.exists() or _LIB_PATH.stat().st_mtime < sources_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))

    _mincut_argtypes = [
        ctypes.c_int32, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.maxflow_mincut.restype = ctypes.c_double
    lib.maxflow_mincut.argtypes = _mincut_argtypes
    lib.bk_maxflow_mincut.restype = ctypes.c_double
    lib.bk_maxflow_mincut.argtypes = _mincut_argtypes
    lib.largest_k_components.restype = ctypes.c_int32
    lib.largest_k_components.argtypes = [
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def maxflow_mincut(
    num_nodes: int,
    edge_u: np.ndarray,
    edge_v: np.ndarray,
    cap: np.ndarray,
    cap_rev: np.ndarray,
    cap_src: np.ndarray,
    cap_snk: np.ndarray,
    algo: str = "bk",
):
    """Run min-cut; returns (flow, labels[num_nodes] uint8, 0=source/edit side).

    algo="bk" (default) is the Boykov-Kolmogorov dual-tree algorithm — the
    same algorithm the reference's PyMaxflow dependency uses
    (refinement_functions.py:251-293), and ~20x faster than "dinic" on the
    6-connected voxel grids cut here. "dinic" retained for cross-validation.
    """
    lib = get_lib()
    entry = lib.bk_maxflow_mincut if algo == "bk" else lib.maxflow_mincut
    edge_u = np.ascontiguousarray(edge_u, dtype=np.int32)
    edge_v = np.ascontiguousarray(edge_v, dtype=np.int32)
    cap = np.ascontiguousarray(cap, dtype=np.float32)
    cap_rev = np.ascontiguousarray(cap_rev, dtype=np.float32)
    cap_src = np.ascontiguousarray(cap_src, dtype=np.float32)
    cap_snk = np.ascontiguousarray(cap_snk, dtype=np.float32)
    labels = np.zeros(num_nodes, dtype=np.uint8)
    flow = entry(
        num_nodes, len(edge_u),
        _ptr(edge_u, ctypes.c_int32), _ptr(edge_v, ctypes.c_int32),
        _ptr(cap, ctypes.c_float), _ptr(cap_rev, ctypes.c_float),
        _ptr(cap_src, ctypes.c_float), _ptr(cap_snk, ctypes.c_float),
        _ptr(labels, ctypes.c_uint8),
    )
    return flow, labels


def largest_k(volume: np.ndarray, k: int = 10, connectivity: int = 26):
    """cc3d.largest_k-compatible labeling: i-th largest component -> label
    k-i+1 (largest gets k), 0 elsewhere. Returns (labels, num_components)."""
    volume = np.ascontiguousarray(volume.astype(np.uint8))
    X, Y, Z = volume.shape
    labels = np.zeros(volume.shape, dtype=np.int32)
    n = get_lib().largest_k_components(
        _ptr(volume, ctypes.c_uint8), X, Y, Z, connectivity, k,
        _ptr(labels, ctypes.c_int32),
    )
    return labels, n
