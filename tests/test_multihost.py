"""Multi-host runtime plumbing: single-host no-op init, global mesh shape,
and the distributed-BA factory accepting the global mesh (the same program
that targets a pod slice; here it spans the 8 virtual CPU devices)."""
import jax
import numpy as np

from orb_slam3_fast_tpu.parallel import multihost


def test_initialize_single_host_noop():
    assert multihost.initialize() is False  # no coordinator -> local only
    rank, world = multihost.process_info()
    assert rank == 0 and world == 1


def test_global_mesh_spans_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("obs",)


def test_dist_ba_accepts_global_mesh():
    from orb_slam3_fast_tpu.cameras import models as cam_models
    from orb_slam3_fast_tpu.parallel import dist_ba

    cam = cam_models.Camera.pinhole(400.0, 400.0, 320.0, 240.0)
    mesh = multihost.global_mesh()
    fn = dist_ba.get_distributed_ba(mesh, cam, 0.0, 2, 2)
    assert fn is dist_ba.get_distributed_ba(mesh, cam, 0.0, 2, 2)  # cached
