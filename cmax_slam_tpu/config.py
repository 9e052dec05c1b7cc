"""Configuration dataclasses for CMax-SLAM-TPU.

Mirrors the reference's parameter surface
(``/root/reference/include/utils/parameters.h:8-102`` and the launch files
``/root/reference/launch/*.launch``) with explicit defaults matching
``/root/reference/src/cmax_slam.cpp:21-83``. Configs are plain frozen
dataclasses so they hash as static jit arguments.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field

# Contrast measures (reference: include/frontend/local_focus_funcs.h:7-11)
VARIANCE_CONTRAST = 0
MEAN_SQUARE_CONTRAST = 1
IMAGE_GRADIENT_MAGNITUDE_CONTRAST = 2


@dataclass(frozen=True)
class WarpOptions:
    """Reference: OptionsWarp (include/utils/parameters.h:17-28)."""

    blur_sigma: float = 1.0
    event_batch_size: int = 100
    event_sample_rate: int = 1
    # MXU precision of the vote/blur matmuls: "highest" = f32-exact
    # (6-pass), "high" = ~3-pass, "default" = single bf16 pass (~3x faster,
    # rel. err ~1e-3 on the IWE). "default" is the library default: the IWE
    # is a statistical accumulation and the CMax solve tolerances dominate —
    # measured trajectory RMS 0.083 deg vs 0.076 at "highest" on the 6 s
    # realtime stream (both under the 0.1 deg north star), and it is what
    # makes full-system replay faster than realtime on one chip
    # (examples/tpu_realtime_check.py). On CPU the knob is a no-op (f32
    # matmuls are exact at every setting), so the oracle-parity suites are
    # unaffected. The reference computes in f64 on CPU; set "highest" for
    # bit-level parity experiments.
    precision: str = "default"


@dataclass(frozen=True)
class SlidingWindowOptions:
    """Reference: OptionSlidingwindow (include/utils/parameters.h:38-45)."""

    time_window_size: float = 0.2
    sliding_window_stride: float = 0.1


@dataclass(frozen=True)
class TrajectoryOptions:
    """Reference: OptionTraj (include/utils/parameters.h:48-55)."""

    dt_knots: float = 0.1
    spline_degree: int = 1  # 1=Linear, 3=Cubic


@dataclass(frozen=True)
class PanoMapOptions:
    """Reference: OptionPanoMap (include/utils/parameters.h:59-73)."""

    pano_height: int = 1024
    pano_width: int = 2048
    y_angle_deg: float = 0.0
    max_update_times: int = 10
    backend_min_ev_rate: int = 10


@dataclass(frozen=True)
class OptimOptions:
    """Optimizer budget; reference hard-codes these
    (src/frontend/local_optim_contrast_gsl.cpp:108-122,
    src/backend/global_optim_contrast_gsl.cpp:41-53)."""

    max_line_searches: int = 50
    initial_step: float = 0.1
    line_search_tol: float = 0.05  # directional-derivative reduction factor
    grad_tol: float = 1e-3  # front-end; back-end uses 1e-4
    fun_tol: float = 1e-4
    # Bracket budget per line search (our bidirectional ladder, not a GSL
    # knob): 16 spans step scales 2^-4..2^4 before declaring no-progress.
    # Warm-started solves bracket in 1-3 evals so the cap rarely binds —
    # but cutting it to 10 was measured to lock the FIRST back-end windows
    # into their integrator error (cubic e2e RMS 0.6 -> 3.8 deg): the big
    # first-window corrections need the ladder's outer rungs. Keep 16.
    max_fevals_per_linesearch: int = 16
    # Consecutive stalls (GSL stagnation test or failed bracket) required to
    # STOP; earlier stalls restart the solve with steepest descent + the
    # bracket ladder re-seeded at initial_step. 1 = exact GSL semantics
    # (stop on first stall) and is the default EVERYWHERE: patience > 1 in
    # the back-end BA lets weakly-constrained windows (sparse texture, no
    # global-map overlap) keep riding a slow spurious-descent direction —
    # equirect contrast genuinely increases as a window's whole pose slides
    # pole-ward (area distortion concentrates votes) — for the full
    # iteration budget, injecting multi-degree trajectory jumps (measured:
    # 0.08 -> 20.7 deg RMS on the realtime replay at patience=3). The
    # early-stall restart stays available as an opt-in knob for narrow
    # curved valleys (cubic BA experiments).
    stagnation_patience: int = 1
    # Secant-refinement budget per line search (phase 2 of every ladder):
    # value+grad evaluations polishing the bracket winner until GSL's
    # |g.u| <= tol*|g| rule holds. Each is a sequential while_loop trip —
    # at packet sizes trip latency rivals the eval itself, so this cap is
    # a first-order knob on front-end stride device time. 4 = round-3
    # behavior.
    secant_refine_evals: int = 4
    # Line-search bracket strategy: "sequential" probes ladder rungs one at
    # a time in a while_loop (GSL-shaped); "vector" evaluates every rung in
    # one vmapped objective call — much faster on TPU for small objectives
    # where loop-iteration overhead dominates (the front-end packet solve),
    # and it picks the globally best rung instead of the first local dip;
    # "grid" evaluates the sequential ladder's whole reachable 2^m grid in
    # one batched call and REPLAYS the sequential decision process over the
    # values — the sequential pick (safe for the curved-valley BA, where
    # "vector"'s global argmin hops basins) at vector-call latency.
    ladder: str = "sequential"
    # Conjugate-direction formula: "fr" = Fletcher-Reeves (GSL conjugate_fr,
    # the reference's method); "pr" = Polak-Ribiere+ (auto-restarting beta;
    # measured worse on the cubic BA — kept as a knob).
    cg_variant: str = "fr"


@dataclass(frozen=True)
class FrontendConfig:
    """Reference: AngVelEstParams (include/utils/parameters.h:76-86)."""

    contrast_measure: int = VARIANCE_CONTRAST
    num_events_per_packet: int = 30000
    dt_ang_vel: float = 0.02
    warp: WarpOptions = field(default_factory=WarpOptions)
    # Vector ladder by default: the packet objective is small enough that
    # sequential bracket probing is loop-overhead-bound on TPU (measured
    # ~2.4 ms/CG-iteration sequential vs ~0.5 ms of eval work). Secant
    # budget stays at the GSL-shaped 4: the round-4 default of 2 saved
    # ~10 ms/stride but silently degraded oracle-parity trajectory RMS
    # 0.084 -> 0.126 deg (per-packet omega errors it leaves behind are
    # individually tiny — median gap 0.013 -> 0.019 — but they integrate
    # into the back-end's initial knots and the frozen early knots keep
    # them). Set secant_refine_evals=2 only when trading accuracy for
    # stride latency is explicitly acceptable (e.g. live load-shedding).
    optim: OptimOptions = field(
        default_factory=lambda: OptimOptions(ladder="vector"))
    show_iwe: bool = False
    # Coarse-to-fine CMax (no reference counterpart): first solve on a
    # 3x-blurred IWE (wider basin of attraction for fast motion from cold
    # starts), then refine at blur_sigma. Costs ~2x per solve; off by default.
    coarse_to_fine: bool = False
    # Stride batching (TPU-native scheduling; no reference counterpart): when
    # an ingest chunk completes >= 2 packets, solve them all in ONE vmapped
    # device program with this many Jacobi warm-start sweeps (sweep 1 starts
    # every lane from the previous stride's solution, sweep k from the left
    # neighbor's sweep k-1 result). Objective and convergence tests are
    # unchanged — only the warm-start schedule differs from the reference's
    # strictly sequential chain (ang_vel_estimator.cpp keeps ang_vel_ across
    # packets); measured equal-accuracy at ~5x less device time per stride.
    # 0 = always use the sequential path.
    batch_sweeps: int = 2
    # Device-resident event ring (TPU-native; no reference counterpart —
    # the reference re-reads its host event vector per packet,
    # ang_vel_estimator.cpp:137-147). Events cross the host->device link
    # ONCE at 8 B each (bearing-LUT index + relative time); the packet
    # solvers gather their overlapping packets from the ring on device.
    # Solver inputs are bit-identical to the upload path; strides whose
    # packets were lapped by the ring fall back to host marshalling
    # automatically. Upload was measured at 75% of front-end stride cost
    # at ECRot-shed geometry before this (examples/tpu_fe_host_decomp.py).
    device_store: bool = True
    # Ring capacity in events (rounded up to a power of two).
    # 0 = auto: >= 16 packets of reach-back, minimum 2^21 (16 MiB HBM).
    device_store_capacity: int = 0


@dataclass(frozen=True)
class BackendConfig:
    """Reference: PoseGraphParams (include/utils/parameters.h:89-102)."""

    contrast_measure: int = VARIANCE_CONTRAST
    sliding_window: SlidingWindowOptions = field(default_factory=SlidingWindowOptions)
    warp: WarpOptions = field(default_factory=WarpOptions)
    trajectory: TrajectoryOptions = field(default_factory=TrajectoryOptions)
    pano_map: PanoMapOptions = field(default_factory=PanoMapOptions)
    # NOTE: initial_step stays at the front-end's 0.1 even though BA
    # increments are tiny (~1e-3..1e-2 rad): starting the bracket ladder
    # small makes early line-search improvements small, which trips the
    # GSL relative-stagnation test (fun_tol) after 1-2 iterations and
    # leaves the first cubic windows under-refined (measured: 0.02 start
    # degraded cubic e2e RMS 0.6 -> 3.8 deg for no wall-clock gain).
    # stagnation_patience MUST stay 1 here (see OptimOptions): patience=3
    # let weakly-constrained windows wander pole-ward for 50 iterations,
    # 0.08 -> 20.7 deg RMS on examples/tpu_realtime_check.py.
    optim: OptimOptions = field(
        default_factory=lambda: OptimOptions(
            grad_tol=1e-4, line_search_tol=0.1
        )
    )
    show_iwe: bool = False
    draw_fov: bool = False
    gamma: float = 0.75
    # Static cap on the padded per-window event subset (TPU static shapes).
    max_events_per_window: int = 1 << 18
    # FOV-crop solver: evaluate each window's objective on a crop around the
    # warped-event footprint (exact; ops/warp_pano.make_crop_objective). The
    # margin bounds how far the optimizer may move knots before the
    # escape check triggers a full-pano re-solve of that window.
    crop_solver: bool = True
    crop_margin_rad: float = 0.1
    # Knots frozen in the VERY FIRST window. The reference freezes the first
    # `degree` knots (1 linear / 3 cubic, pose_graph_optimizer.cpp:261-264);
    # for the cubic spline that permanently locks ~3*dt_knots of raw
    # front-end integrator error into the map origin, which later windows
    # then fight (measured: windows 1-3 maxing the 50-iteration budget).
    # One frozen knot pins the gauge just as well; None = reference
    # semantics (degree).
    first_window_frozen_knots: int | None = 1
    # Bounded BA solve restarts per window: after the CG solve stops, run
    # the minimizer again from the optimum with the bracket ladder
    # re-seeded at initial_step (fresh stall counters). GSL's relative-
    # stagnation test stops a curved-valley solve as soon as one line
    # search's improvement is small — in the cubic spline's narrow valleys
    # that is routinely premature, and a full-scale re-probe keeps moving
    # (the round-3 verdict's cubic-accuracy item). A restart on a truly
    # converged window costs ~1 extra line search. None = auto: 1 restart
    # for the cubic (order-4) back-end, 0 for linear (which measures at
    # the north star without it).
    ba_solve_restarts: int | None = None
    # OPT-IN trust region on the per-window BA correction: the solve STOPS
    # (device side, ops/optim._within_trust) once any knot's rotation
    # increment exceeds this many radians, and the host REJECTS the whole
    # correction (keeps the FE-integrated knots, skips the map absorption).
    # Default None = disabled, and the measured trade-off is why: large
    # per-window corrections are usually the map-alignment term
    # RE-LOCALIZING the trajectory after a front-end dropout (sparse
    # stretches make packets degenerate -> omega=0 while the camera still
    # moves; the BA's 2-4 deg/window steps pull the pose back onto the
    # global map). Capping at 2 deg on the 6 s realtime stream blocked that
    # recovery: RMS 0.08 -> 40.9 deg. Enable (e.g. 0.05-0.1 rad) only for
    # production streams where the front-end is trusted and a multi-degree
    # window correction can only mean a degenerate-landscape wander
    # (equirect contrast genuinely improves as a weakly-textured window
    # slides pole-ward — measured 18 deg knot moves in 50-iteration spins).
    # The reference has no such guard (SURVEY.md section 5).
    max_ba_correction_rad: float | None = None
    # Quadratic prior weight 0.5*lam*||dx||^2 toward the incoming knots,
    # applied ONLY during offline refine sweeps (Backend.refine_pass),
    # where the incoming trajectory is the online optimum (MAP prior). The
    # online pass always runs with 0 (a pull toward the FE-integrated
    # guess was measured to hurt BA). Measured ~nil effect on the e2e
    # streams once tail windows are domain-clamped (0.0899 vs 0.0902 at
    # lam=100), so it defaults off; kept as a robustness knob for weakly
    # textured recordings.
    refine_prior_lambda: float = 0.0
    # One-time ONLINE bootstrap re-solve (beyond the reference, causal):
    # when the back-end reaches this window index, re-run the sliding-
    # window BA once over the already-tracked span against the global map
    # accumulated so far (Backend.refine_pass with t_stop), then resume
    # streaming. The first windows optimize against a nearly-empty IG and
    # bake their error into the early knots (the reference never revisits
    # them, pose_graph_optimizer.cpp:283-288); by window ~4 the map is rich
    # enough to anchor them. Uses only past events (retained in the shared
    # store until the re-solve runs), so the output remains a valid online
    # trajectory; costs `index` extra window solves, once.
    #
    # DEFAULT ON (4): this is what puts the stock presets at the <= 0.1 deg
    # north star online (measured 0.372 -> 0.093 deg cubic e2e; the linear
    # e2e and oracle-parity gates certify the same defaults). The cost is
    # bounded and one-time: 4 extra window solves and ~4 strides of events
    # retained until the re-solve fires. Set None for latency-critical live
    # feeds (live_davis_config does) or to mirror the reference's strictly
    # never-revisit protocol.
    bootstrap_resolve_window: int | None = 4


@dataclass(frozen=True)
class SystemConfig:
    """Top-level config, analog of the launch-file parameter block
    (/root/reference/launch/ijrr.launch)."""

    frontend: FrontendConfig = field(default_factory=FrontendConfig)
    backend: BackendConfig = field(default_factory=BackendConfig)
    frontend_event_sample_rate: int = 1


def ijrr_config(num_events_per_packet: int = 10000) -> SystemConfig:
    """Per-dataset preset mirroring /root/reference/launch/ijrr.launch."""
    return SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=num_events_per_packet,
            dt_ang_vel=0.01,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.1),
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=512, pano_width=1024, max_update_times=200,
                backend_min_ev_rate=10000,
            ),
            gamma=0.75,
            draw_fov=True,
        ),
    )


def ecrot_synth_config() -> SystemConfig:
    """Preset mirroring /root/reference/launch/ecrot_synth.launch."""
    return SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=70000,
            dt_ang_vel=0.005,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.1),
            # backend_event_sample_rate=1 like the launch file (decimation is
            # unnecessary since the O(N) scatter vote path).
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=512, pano_width=1024, max_update_times=200,
                backend_min_ev_rate=10000,
            ),
        ),
    )


def ecrot_real_config(y_angle_deg: float = 0.0) -> SystemConfig:
    """Preset mirroring /root/reference/launch/ecrot_handheld.launch (use
    y_angle_deg=-90 for ecrot_mount.launch — the only difference): 200k-event
    packets, non-overlapping 0.2s windows, 2048-high panorama."""
    return SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=200000,
            dt_ang_vel=0.01,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.2),
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=2048, pano_width=4096, max_update_times=200,
                backend_min_ev_rate=10000, y_angle_deg=y_angle_deg,
            ),
            max_events_per_window=1 << 20,
        ),
    )


def ecrot_mount_config() -> SystemConfig:
    """Preset mirroring /root/reference/launch/ecrot_mount.launch."""
    return ecrot_real_config(y_angle_deg=-90.0)


def live_davis_config() -> SystemConfig:
    """Preset mirroring /root/reference/launch/live_davis.launch (load-shedding)."""
    return SystemConfig(
        frontend=FrontendConfig(
            num_events_per_packet=5000,
            dt_ang_vel=0.04,
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=1),
        ),
        backend=BackendConfig(
            sliding_window=SlidingWindowOptions(0.2, 0.1),
            warp=WarpOptions(blur_sigma=1.0, event_batch_size=100, event_sample_rate=5),
            trajectory=TrajectoryOptions(dt_knots=0.05, spline_degree=1),
            pano_map=PanoMapOptions(
                pano_height=512, pano_width=1024, max_update_times=200,
                backend_min_ev_rate=10,
            ),
            # Live mode sheds load everywhere (the launch file decimates 10x
            # front / 5x back); the one-time bootstrap re-solve would add a
            # 4-window latency spike right as tracking starts, so live keeps
            # the reference's never-revisit protocol.
            bootstrap_resolve_window=None,
        ),
        frontend_event_sample_rate=10,
    )


def replace(cfg, **kwargs):
    """dataclasses.replace that tolerates nested dotted keys ('warp.blur_sigma').

    Dotted keys sharing a prefix ('pano_map.pano_height' and
    'pano_map.pano_width') are grouped and applied in ONE sub-replace, so
    they compose instead of the later one clobbering the earlier.
    """
    flat = {}
    nested: dict = {}
    for key, val in kwargs.items():
        if "." in key:
            head, rest = key.split(".", 1)
            nested.setdefault(head, {})[rest] = val
        else:
            flat[key] = val
    for head, sub_kwargs in nested.items():
        if head in flat:
            raise ValueError(
                f"conflicting keys: '{head}' set both directly and via dotted keys")
        flat[head] = replace(getattr(cfg, head), **sub_kwargs)
    return dataclasses.replace(cfg, **flat)
