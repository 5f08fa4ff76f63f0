"""System facade wiring contracts that stubs in other tests would mask.

Regression for the round-3 advisor finding: the MergeInertialBA hook
(System ctor -> LoopCloser.inertial_ba) must accept the ``window=`` kwarg the
loop closer passes for the full-chain inertial GBA (loopcloser ``_correct``
calls ``self.inertial_ba(world, K-1, window=K)``), matching the reference's
FullInertialBA-vs-MergeInertialBA split (Optimizer.cc:374/3996).
"""
import numpy as np

from orb_slam3_fast_tpu.slam.system import IMU_STEREO, System


def test_inertial_ba_hook_accepts_window_kwarg():
    sys_ = System(
        "configs/EuRoC_stereo_inertial.yaml",
        sensor=IMU_STEREO,
        max_keyframes=32,
        async_backend=False,
    )
    assert sys_.loopcloser is not None
    hook = sys_.loopcloser.inertial_ba
    assert hook is not None
    # exercise the REAL wired hook (not a test stub) through both call shapes
    # the loop closer uses; an empty map makes both no-ops, but a signature
    # mismatch raises TypeError before any early-out can run
    hook(sys_.world, 0)                # MergeLocal2 welding-window call
    hook(sys_.world, 0, window=8)      # full-chain inertial GBA call
    sys_.shutdown()
