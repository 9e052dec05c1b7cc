"""Segment-per-device full-system replay with overlap stitching
(parallel/replay.py): correctness on the virtual 8-device CPU mesh.

The reference has no distributed execution (SURVEY.md section 2.3); this is
the TPU-native temporal-parallel offline mode. The stitched trajectory must
match ground truth about as well as a single sequential system does.
"""

import numpy as np
import jax
import pytest

from cmax_slam_tpu import spline
from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import (
    BackendConfig, FrontendConfig, PanoMapOptions, SlidingWindowOptions,
    SystemConfig, TrajectoryOptions, WarpOptions,
)
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.parallel import replay
from cmax_slam_tpu.utils.evaluate import rotation_rms_deg

# Full-tier suite: long e2e run (see pytest.ini; run with -m "")
pytestmark = pytest.mark.slow


W, H = 120, 90
FXY = 90.0


@pytest.fixture(scope="module")
def long_stream():
    """Smooth time-varying rotation (slow start — a fast constant spin from
    t=0 on sparse landmarks gives packet-level CMax almost no contrast
    signal in the first ~0.3 s, which is a property of the stream, not the
    tracker; see test_e2e.smooth_rot_fn)."""
    from test_e2e import smooth_rot_fn

    rng = np.random.default_rng(21)
    n, duration = 400_000, 2.0
    rot_fn, omega_fn = smooth_rot_fn(duration)
    ev = synthetic.rotating_camera_events(
        rng, n, duration, np.zeros(3), FXY, FXY, W / 2, H / 2, W, H,
        n_points=260, rot_fn=rot_fn,
    )
    return ev, rot_fn


def _cfg():
    # Small shapes + no crop solver: each segment DEVICE gets its own copy
    # of every compiled program (pjit executables are per-device), so the
    # test keeps the compile surface minimal.
    return SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=6000, dt_ang_vel=0.02,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.1),
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            # 256x512 pano: fx ~81 px/rad, enough angular resolution for the
            # sub-0.5-degree gate (128x256 cannot resolve it: 0.2 deg is
            # 0.14 px there).
            pano_map=PanoMapOptions(
                pano_height=256, pano_width=512, backend_min_ev_rate=1000,
                max_update_times=200,
            ),
            crop_solver=False,
        ),
    )


def test_segmented_replay_stitches(long_stream):
    ev, rot_fn = long_stream
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FXY, 0, W / 2], [0, FXY, H / 2], [0, 0, 1.0]]),
    )
    assert len(jax.devices()) >= 3
    times, quats, segs = replay.replay_multichip(
        ev.xs, ev.ys, ev.ts, ev.pols, calib, _cfg(),
        n_segments=3, overlap=0.3, chunk_events=40_000,
    )
    # every segment ran its own backend (independent maps/trajectories)
    assert all(len(s.slam.window_results()) >= 2 for s in segs)
    assert len(times) > 100
    assert np.all(np.diff(times) > 0), "stitched times must be increasing"
    # accuracy vs ground truth after the usual global gauge alignment
    from cmax_slam_tpu import lie

    q_gt = np.asarray(lie.from_matrix(rot_fn(times)))
    rms, errs = rotation_rms_deg(times, q_gt, quats, "global")
    # per-segment own-gauge quality (printed with -s; shown on failure)
    for s in segs:
        tr = s.slam.backend.traj
        tg = np.linspace(max(s.t_keep_lo, tr.t_beg + 1e-6),
                         min(s.t_keep_hi, tr.max_time() - 1e-6), 40)
        qe = tr.evaluate(tg)
        qg = np.asarray(lie.from_matrix(rot_fn(tg)))
        r, e = rotation_rms_deg(tg, qg, qe, "global")
        print(f"segment {s.index}: own-gauge RMS {r:.4f} deg "
              f"(max {e.max():.3f}), windows={len(s.slam.window_results())}")
    print(f"stitched: RMS {rms:.4f} deg, max err {errs.max():.3f}")
    assert rms < 0.5, f"stitched RMS {rms} deg (max err {errs.max()})"
    # the stitch seams must not be outliers: per-sample error stays bounded
    assert errs.max() < 1.5, f"seam outlier: max err {errs.max()} deg"

    # Concurrent per-segment offline refinement (replay_multichip's
    # refine_passes path): sharper interiors AND overlaps, so the refined
    # stitched trajectory must beat the online one.
    replay.refine_segments(segs, ev.xs, ev.ys, ev.ts, ev.pols, passes=1)
    times_r, quats_r = replay.stitch_segments(segs)
    q_gt_r = np.asarray(lie.from_matrix(rot_fn(times_r)))
    rms_r, errs_r = rotation_rms_deg(times_r, q_gt_r, quats_r, "global")
    print(f"refined stitched: RMS {rms_r:.4f} deg, max err {errs_r.max():.3f}")
    assert rms_r < min(0.35, rms + 0.05), \
        f"refined stitched RMS {rms_r} deg (online was {rms})"


def test_segmented_replay_validates_inputs(long_stream):
    ev, _ = long_stream
    calib = CameraCalibration(
        width=W, height=H,
        K=np.array([[FXY, 0, W / 2], [0, FXY, H / 2], [0, 0, 1.0]]),
    )
    with pytest.raises(ValueError, match="devices"):
        replay.replay_multichip(
            ev.xs, ev.ys, ev.ts, ev.pols, calib, _cfg(),
            n_segments=len(jax.devices()) + 1,
        )
    with pytest.raises(ValueError, match="overlap"):
        replay.replay_multichip(
            ev.xs, ev.ys, ev.ts, ev.pols, calib, _cfg(),
            n_segments=3, overlap=10.0,
        )
