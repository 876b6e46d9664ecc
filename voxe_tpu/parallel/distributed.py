"""Multi-host initialization: `jax.distributed` over ICI/DCN.

The reference is strictly single-GPU (SURVEY.md §2 parallelism inventory:
no torch.distributed anywhere); this is the TPU-native scaling layer's
multi-host leg (SURVEY.md §5 distributed-backend spec: "single-program
jax.distributed init, device mesh over ICI").

Design: single-program multiple-data. Every host runs the same CLI with
`--multihost True`; `jax.distributed.initialize()` discovers coordinator /
process_id / num_processes from the TPU environment (or the
JAX_COORDINATOR_ADDRESS / JAX_PROCESS_ID / JAX_NUM_PROCESSES variables on
CPU/GPU clusters). After init, `jax.devices()` spans ALL hosts, so the 1-D
ray-DP mesh from voxe_tpu.parallel.mesh covers the full slice and GSPMD
routes the gradient psum over ICI within a host and DCN across hosts.

Only process 0 should write checkpoints/logs — trainers consult
`is_primary_host()`.
"""
from __future__ import annotations

import os
from typing import Optional

import jax

from voxe_tpu.utils.logging import log

_initialized = False


def maybe_init_distributed(
    multihost: bool = False,
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize `jax.distributed` when multi-host execution is requested.

    No-op (returns False) for the default single-host run — single-host
    semantics are completely unchanged. Safe to call more than once.

    On TPU pods the three parameters are auto-discovered; on CPU/GPU test
    clusters they come from the explicit arguments or the standard
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars
    (the form the two-process CPU smoke test uses,
    tests/test_parallel.py::test_multihost_init_two_cpu_processes).
    """
    global _initialized
    if not multihost:
        return False
    if _initialized:
        return True
    kwargs = {}
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    _initialized = True
    log.info(
        f"jax.distributed initialized: process {jax.process_index()}/"
        f"{jax.process_count()}, {jax.local_device_count()} local / "
        f"{jax.device_count()} global devices"
    )
    return True


def is_primary_host() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
