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


def test_map_changed_change_index_and_vocab_checksum(tmp_path):
    """map_changed(): once-per-update change-index semantics (Map.cc:306-324);
    save/load_atlas: vocabulary MD5 guard (System.cc:1430-1531)."""
    from orb_slam3_fast_tpu.slam.system import STEREO

    sys_ = System(
        "configs/synthetic_stereo.yaml", sensor=STEREO,
        max_keyframes=32, async_backend=False,
    )
    sys_.map_changed()  # drain initial state
    assert not sys_.map_changed()
    sys_.world.change_index += 1  # a BA write-back would do this
    assert sys_.map_changed()
    assert not sys_.map_changed()  # notified only once

    p = str(tmp_path / "atlas")
    sys_.save_atlas(p)
    import os

    assert os.path.exists(p + ".md5")
    sys_.load_atlas(p)  # same vocabulary: loads fine
    # a different vocabulary must be rejected
    with open(p + ".md5", "w") as f:
        f.write("0" * 32)
    import pytest

    with pytest.raises(ValueError, match="checksum"):
        sys_.load_atlas(p)
    sys_.shutdown()


def test_verbose_levels(capsys):
    from orb_slam3_fast_tpu.utils import verbose

    verbose.set_verbosity(verbose.VERBOSITY_QUIET)
    verbose.print_mess("hidden", verbose.VERBOSITY_NORMAL)
    verbose.set_verbosity(verbose.VERBOSITY_VERBOSE)
    verbose.print_mess("shown", verbose.VERBOSITY_NORMAL)
    verbose.set_verbosity(verbose.VERBOSITY_QUIET)
    err = capsys.readouterr().err
    assert "hidden" not in err and "shown" in err
