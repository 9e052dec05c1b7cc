#!/usr/bin/env python
"""Reference-parity comparison harness.

Compares this framework's CLI outputs against outputs produced by the C++
reference (tub-rip/cmax_slam) on the same dataset:

- trajectory:  gauge-aligned rotation RMS (deg) between two TUM files
               (ours: out/trajectory_tum.txt; reference: exported from its
               pose publisher or saved trajectory).
- angular velocity: per-axis and norm error stats between two 't wx wy wz'
               text files (ours: out/angular_velocity.txt; reference: a dump
               of its /dvs/angular_velocity TwistStamped topic, rad/s).
- pano map:    mean/max absolute pixel difference between two map dumps
               saved as .npy/.npz arrays.

No real ECD/ECRot datasets (and no reference binaries) exist in this
sandbox, so PARITY.md's RMS numbers are vs SYNTHETIC ground truth; this tool
is the ready-to-run bridge for the day real reference outputs are available:

    python tools/compare_to_reference.py \
        --ours-traj out/trajectory_tum.txt --ref-traj ref_traj.txt \
        --ours-av out/angular_velocity.txt --ref-av ref_av.txt

Prints one JSON summary line; exits 1 when a --max-* gate is violated.
"""

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from cmax_slam_tpu.utils.evaluate import read_tum_trajectory, rotation_rms_deg


def compare_trajectories(ours_path: str, ref_path: str, alignment: str):
    t_o, q_o = read_tum_trajectory(ours_path)
    t_r, q_r = read_tum_trajectory(ref_path)
    # Evaluate on the overlap of both time ranges, at the reference's stamps.
    lo = max(t_o[0], t_r[0])
    hi = min(t_o[-1], t_r[-1])
    keep = (t_r >= lo) & (t_r <= hi)
    if keep.sum() < 2:
        raise SystemExit("trajectories do not overlap in time")
    t = t_r[keep]
    q_r = q_r[keep]
    # Nearest-sample interpolation of ours onto the reference stamps (both
    # are densely sampled splines; slerp would change nothing measurable).
    idx = np.clip(np.searchsorted(t_o, t), 0, len(t_o) - 1)
    q_o_i = q_o[idx]
    rms, errs = rotation_rms_deg(t, q_r, q_o_i, alignment)
    return {
        "trajectory_rms_deg": float(rms),
        "trajectory_max_deg": float(np.max(errs)),
        "trajectory_samples": int(len(t)),
    }


def compare_ang_vel(ours_path: str, ref_path: str):
    ours = np.atleast_2d(np.loadtxt(ours_path))
    ref = np.atleast_2d(np.loadtxt(ref_path))
    # Interpolate ours onto the reference timestamps within the overlap.
    lo = max(ours[0, 0], ref[0, 0])
    hi = min(ours[-1, 0], ref[-1, 0])
    keep = (ref[:, 0] >= lo) & (ref[:, 0] <= hi)
    if keep.sum() < 2:
        raise SystemExit("angular-velocity logs do not overlap in time")
    t = ref[keep, 0]
    w_ref = ref[keep, 1:4]
    w_ours = np.stack(
        [np.interp(t, ours[:, 0], ours[:, 1 + i]) for i in range(3)], axis=-1
    )
    err = np.linalg.norm(w_ours - w_ref, axis=-1)
    return {
        "ang_vel_median_err": float(np.median(err)),
        "ang_vel_p90_err": float(np.percentile(err, 90)),
        "ang_vel_rms_err": float(np.sqrt(np.mean(err**2))),
        "ang_vel_samples": int(len(t)),
    }


def compare_maps(ours_path: str, ref_path: str):
    def load(p):
        a = np.load(p)
        if hasattr(a, "files"):  # npz
            a = a[a.files[0]]
        return np.asarray(a, np.float64)

    ours, ref = load(ours_path), load(ref_path)
    if ours.shape != ref.shape:
        raise SystemExit(f"map shapes differ: {ours.shape} vs {ref.shape}")
    scale = max(np.abs(ref).max(), 1e-12)
    d = np.abs(ours - ref)
    return {
        "map_mean_abs_diff_rel": float(d.mean() / scale),
        "map_max_abs_diff_rel": float(d.max() / scale),
    }


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--ours-traj")
    p.add_argument("--ref-traj")
    p.add_argument("--ours-av")
    p.add_argument("--ref-av")
    p.add_argument("--ours-map")
    p.add_argument("--ref-map")
    p.add_argument("--alignment", default="global", choices=["global", "first"],
                   help="gauge alignment for the rotation RMS")
    p.add_argument("--max-rms-deg", type=float, default=None,
                   help="fail (exit 1) if trajectory RMS exceeds this "
                        "(BASELINE.md north star: 0.1)")
    p.add_argument("--max-av-median", type=float, default=None)
    args = p.parse_args(argv)

    out = {}
    if args.ours_traj and args.ref_traj:
        out.update(compare_trajectories(args.ours_traj, args.ref_traj,
                                        args.alignment))
    if args.ours_av and args.ref_av:
        out.update(compare_ang_vel(args.ours_av, args.ref_av))
    if args.ours_map and args.ref_map:
        out.update(compare_maps(args.ours_map, args.ref_map))
    if not out:
        p.error("nothing to compare: pass at least one --ours-*/--ref-* pair")

    print(json.dumps(out))
    ok = True
    if args.max_rms_deg is not None:
        ok &= out.get("trajectory_rms_deg", 0.0) <= args.max_rms_deg
    if args.max_av_median is not None:
        ok &= out.get("ang_vel_median_err", 0.0) <= args.max_av_median
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
