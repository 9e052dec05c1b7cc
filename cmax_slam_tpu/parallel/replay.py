"""Multi-chip FULL-SYSTEM replay: segment-per-device SLAM with overlap
stitching.

The reference is strictly sequential — one ROS node, one stream
(src/cmax_slam.cpp; SURVEY.md section 2.3 records zero distributed
execution). The TPU-native headroom beyond per-packet data parallelism
(parallel/sharding.py) is offline *temporal* parallelism: cut a long
recording into N time segments, run a complete independent SLAM system
(front-end + back-end + global map) for each segment on its own device, and
stitch the per-segment trajectories into one.

Why this is sound:
- Each segment gets ``overlap`` seconds of lead-in whose estimates are
  discarded: CMax front-ends converge from cold in a few packets and the
  back-end trajectory is anchored by its own window protocol, so segment
  interiors match the sequential system away from the boundary.
- Rotation-only SLAM has a global SO(3) gauge freedom per segment. On the
  overlap between consecutive segments both trajectories observe the same
  motion, so the relative gauge A = argmin_R sum_t ||R_a(t) - R R_b(t)||_F
  (rotation Procrustes over overlap samples) aligns segment b onto a;
  chaining the alignments yields one consistent trajectory.
- Devices never communicate during the replay (the only cross-device data
  is the host-side stitching of ~tens of quaternions) — scaling over ICI
  or even separate hosts is linear by construction.

On a single host the segments interleave through JAX's async dispatch (each
segment's programs queue on its own device); with one physical chip this
degrades gracefully to sequential execution.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence

import numpy as np
import jax

from ..calib import CameraCalibration
from ..config import SystemConfig
from ..system import CMaxSLAM
from ..utils.evaluate import align_global, quat_to_rotmats
from ..utils.metrics import logger


@dataclass
class Segment:
    index: int
    device: object
    t_lo: float          # feed start (includes lead-in)
    t_hi: float          # feed end
    t_keep_lo: float     # stitched output span [t_keep_lo, t_keep_hi)
    t_keep_hi: float
    slam: CMaxSLAM = None
    ev_lo: int = 0
    ev_hi: int = 0
    cursor: int = 0


def _procrustes_quat(q_a: np.ndarray, q_b: np.ndarray) -> np.ndarray:
    """Rotation A (3x3) minimizing sum ||R(q_a_i) - A R(q_b_i)||_F."""
    return align_global(quat_to_rotmats(q_a), quat_to_rotmats(q_b))


def replay_multichip(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    ps: np.ndarray,
    calib: CameraCalibration,
    cfg: SystemConfig,
    n_segments: int,
    overlap: float = 0.4,
    chunk_events: int = 50_000,
    devices: Optional[Sequence] = None,
    sample_dt: float = 0.01,
    refine_passes: int = 0,
):
    """Replay a full recording as ``n_segments`` independent SLAM systems,
    one per device, and stitch the refined trajectories.

    ``refine_passes > 0`` runs that many offline refinement sweeps
    (CMaxSLAM.refine) per segment before stitching — all segments refine
    CONCURRENTLY, one host thread per device (the window solves are
    device-bound; np.asarray/device_get release the GIL). Sharper segment
    interiors also mean sharper overlaps, which is what the Procrustes
    gauge alignment samples.

    Returns (times, quats, segments): the stitched trajectory sampled every
    ``sample_dt`` seconds (gauge of segment 0) plus the per-segment systems
    for inspection (maps, logs, window results).
    """
    if devices is None:
        devices = jax.devices()
    if n_segments > len(devices):
        raise ValueError(
            f"{n_segments} segments need {n_segments} devices, "
            f"have {len(devices)}"
        )
    t0, t1 = float(ts[0]), float(ts[-1])
    span = (t1 - t0) / n_segments
    if span <= 2 * overlap and n_segments > 1:
        raise ValueError("segments shorter than twice the overlap")

    segs: List[Segment] = []
    for i in range(n_segments):
        keep_lo = t0 + i * span
        keep_hi = t0 + (i + 1) * span
        lo = keep_lo - (overlap if i > 0 else 0.0)
        hi = min(keep_hi + overlap, t1)  # tail overlap feeds the alignment
        seg = Segment(
            index=i, device=devices[i], t_lo=lo, t_hi=hi,
            t_keep_lo=keep_lo, t_keep_hi=keep_hi,
        )
        seg.ev_lo = int(np.searchsorted(ts, lo, side="left"))
        seg.ev_hi = int(np.searchsorted(ts, hi, side="right"))
        seg.cursor = seg.ev_lo
        with jax.default_device(seg.device):
            seg.slam = CMaxSLAM(calib, cfg)
        segs.append(seg)

    # Round-robin feed: one chunk per segment per sweep. Async dispatch keeps
    # every device's queue non-empty while the host cycles.
    live = True
    while live:
        live = False
        for seg in segs:
            if seg.cursor >= seg.ev_hi:
                continue
            live = True
            end = min(seg.cursor + chunk_events, seg.ev_hi)
            with jax.default_device(seg.device):
                seg.slam.push_events(
                    xs[seg.cursor:end], ys[seg.cursor:end],
                    ts[seg.cursor:end], ps[seg.cursor:end],
                )
            seg.cursor = end

    # Join every segment's in-flight back-end window BEFORE stitching: the
    # asynchronous back-end almost always ends a feed with one pending solve
    # whose refined knots cover exactly the trajectory tail the Procrustes
    # alignment samples. close() also releases each segment's readback
    # threads (one system per device would otherwise pin one thread each for
    # the life of the process).
    for seg in segs:
        seg.slam.close()

    if refine_passes > 0:
        refine_segments(segs, xs, ys, ts, ps, refine_passes)

    return stitch_segments(segs, sample_dt) + (segs,)


def refine_segments(segs: List[Segment], xs, ys, ts, ps,
                    passes: int = 1) -> None:
    """Run offline refinement sweeps on every segment CONCURRENTLY — one
    host thread per device (window solves are device-bound;
    np.asarray/device_get release the GIL)."""
    from concurrent.futures import ThreadPoolExecutor

    def _refine(seg):
        with jax.default_device(seg.device):
            seg.slam.refine(
                (xs[seg.ev_lo:seg.ev_hi], ys[seg.ev_lo:seg.ev_hi],
                 ts[seg.ev_lo:seg.ev_hi], ps[seg.ev_lo:seg.ev_hi]),
                passes=passes,
            )

    with ThreadPoolExecutor(len(segs)) as ex:
        list(ex.map(_refine, segs))  # list() re-raises worker errors


def stitch_segments(segs: List[Segment], sample_dt: float = 0.01):
    """Gauge-align consecutive segment trajectories on their overlaps and
    concatenate the kept spans. Returns (times, quats)."""
    A = np.eye(3)  # cumulative alignment onto segment 0's gauge
    all_t: List[np.ndarray] = []
    all_q: List[np.ndarray] = []
    prev = None
    for seg in segs:
        seg.slam.flush()  # idempotent; guards direct stitch_segments callers
    for seg in segs:
        traj = seg.slam.backend.traj
        lo = max(seg.t_keep_lo, traj.t_beg + 1e-6)
        hi = min(seg.t_keep_hi, traj.max_time() - 1e-6)
        if prev is not None:
            # Overlap where BOTH trajectories are defined.
            ptraj = prev.slam.backend.traj
            o_lo = max(traj.t_beg + 1e-6, seg.t_lo)
            o_hi = min(ptraj.max_time() - 1e-6, prev.t_hi)
            n = max(int((o_hi - o_lo) / sample_dt), 4)
            t_ov = np.linspace(o_lo, o_hi, n)
            if o_hi <= o_lo:
                raise RuntimeError(
                    f"segments {prev.index}/{seg.index} have no usable "
                    f"overlap ({o_lo:.3f} >= {o_hi:.3f})"
                )
            q_prev = ptraj.evaluate(t_ov)
            q_curr = traj.evaluate(t_ov)
            # prev is already in the global gauge via A_prev; the local
            # alignment maps curr onto prev, then A_prev maps onto global.
            A = A @ _procrustes_quat(q_prev, q_curr)
            logger.info(
                "[replay] stitched segment %d -> %d over [%.3f, %.3f] "
                "(%d samples)", prev.index, seg.index, o_lo, o_hi, n,
            )
        times = np.arange(lo, hi, sample_dt)
        if len(times):
            q = traj.evaluate(times)
            R = quat_to_rotmats(q)
            from .. import lie

            q_al = np.asarray(lie.from_matrix(A[None] @ R), np.float64)
            all_t.append(times)
            all_q.append(q_al)
        prev = seg
    return np.concatenate(all_t), np.concatenate(all_q)
