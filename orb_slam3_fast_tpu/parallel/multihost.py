"""Multi-host runtime: `jax.distributed` process group + global device mesh.

The reference scales with threads on one box (System.cc:221,241 spawning
LocalMapping/LoopClosing std::threads); the TPU-native scaling axis is SPMD
over a multi-host device mesh — every host runs THE SAME program, arrays are
sharded over the global mesh, and XLA inserts ICI/DCN collectives.  This
module owns the process-group bring-up so the rest of the code never
branches on host count: `global_mesh()` returns a mesh spanning every chip
JAX can see (8 local CPUs in tests, N*4 chips on a pod slice), and
`parallel/dist_ba.py` programs run on it unchanged.

Usage on a pod slice (one process per host):

    from orb_slam3_fast_tpu.parallel import multihost
    multihost.initialize()           # no-op single-host; env-driven on pods
    mesh = multihost.global_mesh()   # all chips, all hosts
    fn = dist_ba.get_distributed_ba(mesh, cam, bf, 8, 12)
"""
from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator: str | None = None, num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Bring up the JAX process group when running multi-host.

    Single-host (or already-initialized) is a no-op returning False.  On TPU
    pods the three arguments are auto-detected from the environment by
    ``jax.distributed.initialize``; they can also be passed explicitly for
    CPU/GPU clusters (coordinator "host:port", world size, rank).
    """
    global _initialized
    if _initialized:
        return False
    explicit = coordinator is not None
    auto = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    # On Cloud TPU pod slices jax.distributed auto-detects the coordinator
    # from TPU metadata with NO coordinator env var set — gate on the pod
    # environment markers too, not just COORDINATOR_ADDRESS-style variables
    tpu_pod = any(
        os.environ.get(v)
        for v in (
            "TPU_WORKER_HOSTNAMES",
            "TPU_WORKER_ID",
            "MEGASCALE_COORDINATOR_ADDRESS",
            "CLOUD_TPU_TASK_ID",
        )
    )
    if not explicit and not auto and not tpu_pod:
        return False  # single-host: local devices only
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except (RuntimeError, ValueError) as e:
        # single-process run with pod-looking env (e.g. one-host v4-8):
        # local devices already form the full mesh — but SAY so, a silently
        # degraded per-host mesh on a real pod is a hard bug to spot
        from orb_slam3_fast_tpu.utils import verbose

        verbose.print_mess(
            f"multihost: pod-like environment detected but "
            f"jax.distributed.initialize failed ({e}); continuing with the "
            f"per-host mesh ({len(jax.local_devices())} local devices)",
            verbose.VERBOSITY_NORMAL,
        )
        return False
    _initialized = True
    return True


def global_mesh(axis: str = "obs") -> Mesh:
    """1-D mesh over every device in the job (all hosts).

    ``jax.devices()`` already returns the GLOBAL device list once the
    process group is up, so the same construction covers one chip, one
    host, and N hosts; programs shard over ``axis`` and psum across it.
    """
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_info() -> tuple[int, int]:
    """(process_index, process_count) — rank 0 does host-side IO (trajectory
    saving, snapshots) exactly once per job."""
    return jax.process_index(), jax.process_count()
