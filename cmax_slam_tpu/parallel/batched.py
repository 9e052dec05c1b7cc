"""Batched (throughput-mode) front-end tracking: solve many packets at once.

The reference's live mode sheds load by decimating events
(launch/live_davis.launch: keep 10 percent). The TPU-native alternative is to
batch: cut the whole stream into packets up front, stack them into one
(P, S) tensor, and run every packet's CMax solve simultaneously — vmapped on
one chip, optionally sharded over a device mesh (BASELINE config 5:
"batched multi-window CMax at millions of events/sec throughput").

Warm starting, which the sequential front-end gets for free, is recovered
with Jacobi-style sweeps: pass 1 solves all packets from zero, pass 2
re-solves each packet initialized from its left neighbor's pass-1 solution.
Two parallel sweeps recover nearly all of the sequential accuracy while
keeping every solve independent.

Measured trade-off (v5e, 122 x 16k-event packets): vmapped solves run the
CG while_loop in LOCKSTEP — every lane pays the slowest lane's iteration
count — and cold starts need ~10x the iterations of warm starts, so on a
SINGLE chip the pipelined sequential front-end (frontend.py, ~36 ms/packet
warm) is faster end-to-end. Use this module when scaling ACROSS chips
(each chip takes a contiguous packet range) or when per-packet latency is
irrelevant and simplicity wins.
"""

from __future__ import annotations

import functools
import time
from typing import NamedTuple, Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import FrontendConfig, OptimOptions
from ..io import native
from ..ops import optim, warp_local
from ..ops.contrast import contrast
from ..utils.metrics import logger
from .sharding import batched_packet_solve


class PacketBatch(NamedTuple):
    bearings: jnp.ndarray  # (P, S, 3)
    dts: jnp.ndarray       # (P, S)
    weights: jnp.ndarray   # (P, S)
    times: np.ndarray      # (P,) packet grid timestamps (host)


def cut_packets(
    xs: np.ndarray,
    ys: np.ndarray,
    ts: np.ndarray,
    lut: np.ndarray,
    cam: warp_local.CameraParams,
    cfg: FrontendConfig,
) -> PacketBatch:
    """Cut a whole stream into fixed-size packets with the reference's
    centered-window semantics (ang_vel_estimator.cpp:74-97), vectorized."""
    half = cfg.num_events_per_packet // 2
    bs = cfg.warp.event_batch_size
    S = ((2 * half + bs - 1) // bs) * bs

    t0 = float(ts[0])
    cursor0 = t0 + 0.5 * cfg.dt_ang_vel
    trig, _, _ = native.scan_triggers(ts, cursor0, 0, cfg.dt_ang_vel,
                                      max_out=1 << 22)
    # keep only complete packets
    trig = trig[(trig + 1 + half) <= len(ts)]
    Pn = len(trig)
    bearings = np.zeros((Pn, S, 3), np.float32)
    dts = np.zeros((Pn, S), np.float32)
    weights = np.zeros((Pn, S), np.float32)
    times = np.zeros(Pn, np.float64)

    for k, idx in enumerate(trig):
        count = int(idx) + 1
        beg = max(count - half, 0)
        end = count + half
        # rigid output grid: t0 + dt/2 + k*dt (ang_vel_estimator.cpp:84-97)
        t_packet = t0 + 0.5 * cfg.dt_ang_vel + k * cfg.dt_ang_vel
        b, tr, w = native.gather_packet(
            xs, ys, ts, beg, end, S, lut, cam.width, t_packet
        )
        bearings[k] = b
        weights[k] = w
        # batch-midpoint dts, relative to the packet grid time
        n = end - beg
        valid = np.zeros(S, bool)
        valid[:n] = True
        tsb = np.zeros(S)
        tsb[:n] = ts[beg:end] - t_packet
        B = S // bs
        t2 = tsb.reshape(B, bs)
        v2 = valid.reshape(B, bs)
        tf = np.where(v2.any(1), np.where(v2, t2, np.inf).min(1), 0.0)
        tl = np.where(v2.any(1), np.where(v2, t2, -np.inf).max(1), 0.0)
        mid = tf + 0.5 * (tl - tf)
        dts[k] = np.repeat(mid, bs).astype(np.float32)
        times[k] = t_packet

    return PacketBatch(
        bearings=jnp.asarray(bearings),
        dts=jnp.asarray(dts),
        weights=jnp.asarray(weights),
        times=times,
    )


def _lane_objective(bearings, dts, weights, cam, blur_sigma, measure,
                    precision="highest"):
    packet = warp_local.EventPacket(bearings, dts, weights)

    def f(omega):
        iwe = warp_local.local_iwe(omega, packet, cam, blur_sigma,
                                   precision=precision, impl="xla")
        return -contrast(iwe, measure)

    return f


@functools.partial(jax.jit, static_argnames=("cam", "blur_sigma", "measure",
                                             "opt", "precision"))
def _init_states(bearings, dts, weights, omega0s, cam, blur_sigma, measure,
                 opt, precision="highest"):
    def one(b, d, w, x0):
        f = _lane_objective(b, d, w, cam, blur_sigma, measure, precision)
        return optim.cg_init(jax.value_and_grad(f), x0, opt.initial_step)

    return jax.vmap(one)(bearings, dts, weights, omega0s)


@functools.partial(jax.jit, static_argnames=("cam", "blur_sigma", "measure",
                                             "opt", "round_iters",
                                             "precision"))
def _run_round(bearings, dts, weights, states, cam, blur_sigma, measure, opt,
               round_iters, precision="highest"):
    def one(b, d, w, s):
        f = _lane_objective(b, d, w, cam, blur_sigma, measure, precision)
        body = optim.make_cg_body(
            jax.value_and_grad(f), f, dim=3,
            line_search_tol=opt.line_search_tol,
            grad_tol=opt.grad_tol,
            fun_tol=opt.fun_tol,
            max_fevals_per_linesearch=opt.max_fevals_per_linesearch,
            stagnation_patience=opt.stagnation_patience,
            initial_step=opt.initial_step,
            cg_variant=opt.cg_variant,
            ladder=opt.ladder,
            secant_refine_evals=opt.secant_refine_evals,
        )
        return optim.cg_run_rounds(body, s, round_iters,
                                   opt.max_line_searches)

    return jax.vmap(one)(bearings, dts, weights, states)


def _quantize_bucket(n: int, min_bucket: int) -> int:
    """Round lane count up to {1, 1.25, 1.5, 1.75} x 2^k (bounded compile
    cache: <= 4 sizes per octave, <= 25% padding vs 100% for pure pow2)."""
    n = max(n, min_bucket)
    if n <= 8:
        return 8
    k = (n - 1).bit_length() - 1  # n in (2^k, 2^(k+1)]
    base = 1 << k
    quarter = base // 4
    return base + ((n - base + quarter - 1) // quarter) * quarter


def track_batched_compacted(
    batch: PacketBatch,
    cam: warp_local.CameraParams,
    cfg: FrontendConfig,
    sweeps: int = 2,
    round_schedule: tuple = (4, 4, 8, 8, 16),
    min_bucket: int = 8,
    cold_decimate: int = 4,
    cold_precision: str = "default",
    mesh: Optional[Mesh] = None,
):
    """Batched tracking without the lockstep-straggler tax.

    The vmapped while_loop in ``track_batched`` runs every lane until the
    SLOWEST lane in its chunk converges. Here each CMax solve is advanced in
    rounds of ``round_iters`` line searches (a fixed-trip fori_loop with
    masked updates — constant-shape under vmap), and between rounds converged
    lanes are dropped on the host and the survivors re-packed into
    power-of-two buckets. Total device work is ~sum of per-lane iteration
    counts (rounded up to the round size) instead of lanes x max-lane.

    Jacobi warm-start sweeps as in track_batched: sweep 2 re-initializes each
    packet from its left neighbor's sweep-1 solution, recovering the
    sequential front-end's warm-start accuracy (ang_vel_estimator.cpp keeps
    ang_vel_ across packets) while staying embarrassingly parallel.

    With ``mesh``, every round's lane bucket is sharded over the mesh's
    "data" axis: the host compacts survivors GLOBALLY across devices and
    re-shards each round, so multi-chip throughput keeps the straggler-free
    schedule (each solve is device-local — no collectives in the hot loop;
    every round's bucket is rounded up to a multiple of the device count so
    the lane axis always splits evenly).

    Returns (times, omegas, costs, iters) like track_batched.
    """
    opt = cfg.optim
    blur_sigma = cfg.warp.blur_sigma
    measure = cfg.contrast_measure
    Pn = batch.bearings.shape[0]
    max_ls = opt.max_line_searches

    shard = None
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        # smallest ladder bucket must split across devices
        min_bucket = max(min_bucket, 4 * n_dev)
        shard = NamedSharding(mesh, P("data"))

    def put(arr):
        """Round inputs: shard the lane axis over the mesh (no-op 1-chip)."""
        if shard is None:
            return jnp.asarray(arr)
        return jax.device_put(np.asarray(arr), shard)

    omegas = np.zeros((Pn, 3), np.float32)
    costs = np.zeros(Pn, np.float32)
    iters = np.zeros(Pn, np.int32)

    for sweep in range(max(sweeps, 1)):
        final = sweep == max(sweeps, 1) - 1
        if sweep > 0:
            omega0 = np.concatenate([omegas[:1], omegas[:-1]], axis=0)
            bearings, dts, weights = batch.bearings, batch.dts, batch.weights
            precision = cfg.warp.precision
        else:
            omega0 = np.zeros((Pn, 3), np.float32)
            # Cold sweep only seeds the warm sweep: decimate events and drop
            # matmul precision (the reference sheds load the same way with
            # event_sample_rate, src/cmax_slam.cpp:155-156). The final sweep
            # always runs full-resolution/full-precision.
            k = 1 if final else max(cold_decimate, 1)
            bearings = batch.bearings[:, ::k]
            dts = batch.dts[:, ::k]
            weights = batch.weights[:, ::k]
            precision = cfg.warp.precision if final else cold_precision
        if mesh is not None:
            # Host copies for global compaction + per-round sharded gathers
            # (a device-side gather across shards would insert collectives).
            bearings = np.asarray(bearings)
            dts = np.asarray(dts)
            weights = np.asarray(weights)
            pad = (-Pn) % min_bucket
            init_idx = np.resize(np.arange(Pn), Pn + pad)
            st_dev = _init_states(
                put(bearings[init_idx]), put(dts[init_idx]),
                put(weights[init_idx]), put(omega0[init_idx]),
                cam, blur_sigma, measure, opt, precision,
            )
            st = optim.CGState(*(np.array(a)[:Pn] for a in st_dev))
        else:
            st_dev = _init_states(
                bearings, dts, weights, jnp.asarray(omega0),
                cam, blur_sigma, measure, opt, precision,
            )
            st = optim.CGState(*(np.array(a) for a in st_dev))
        active = np.arange(Pn)
        t_sweep = time.perf_counter()
        rounds = 0
        while True:
            sub_status = st.status[active]
            sub_it = st.it[active]
            active = active[(sub_status == optim.RUNNING) & (sub_it < max_ls)]
            n = len(active)
            if n == 0:
                break
            bucket = _quantize_bucket(n, min_bucket)
            if mesh is not None:
                # {1,1.25,1.5,1.75}x2^k sizes divide evenly only for
                # power-of-two device counts; round up so the lane axis
                # always splits across the mesh (e.g. 6 devices: 28 -> 30).
                bucket = -(-bucket // n_dev) * n_dev
            idx = np.resize(active, bucket)  # pad by cycling (extras ignored)
            sub = optim.CGState(*(put(np.asarray(a)[idx]) for a in st))
            round_iters = round_schedule[min(rounds, len(round_schedule) - 1)]
            if mesh is not None:
                in_b = put(bearings[idx])
                in_d = put(dts[idx])
                in_w = put(weights[idx])
            else:
                idx_dev = jnp.asarray(idx)
                in_b = jnp.take(bearings, idx_dev, axis=0)
                in_d = jnp.take(dts, idx_dev, axis=0)
                in_w = jnp.take(weights, idx_dev, axis=0)
            out = _run_round(
                in_b, in_d, in_w,
                sub, cam, blur_sigma, measure, opt,
                min(round_iters, max_ls), precision,
            )
            out = optim.CGState(*(np.asarray(a) for a in out))
            for dst, src in zip(st, out):
                dst[active] = src[:n]
            rounds += 1
            logger.debug(
                "[batched] sweep %d round %d: %d active (bucket %d)",
                sweep, rounds, n, bucket,
            )
        logger.info(
            "[batched] sweep %d: %d rounds, %.3fs, mean iters %.1f",
            sweep, rounds, time.perf_counter() - t_sweep, st.it.mean(),
        )
        omegas = st.x.copy()
        costs = st.f.copy()
        iters = st.it.copy()
    return batch.times, omegas, costs, iters


def track_batched(
    batch: PacketBatch,
    cam: warp_local.CameraParams,
    cfg: FrontendConfig,
    mesh: Optional[Mesh] = None,
    sweeps: int = 2,
    chunk_size: int = 16,
):
    """Solve all packets' angular velocities in parallel.

    Returns (times (P,), omegas (P, 3) numpy). With a mesh, the packet axis
    is sharded across devices (pure DP — no collectives in the hot loop).

    Packets are dispatched in chunks of ``chunk_size``: a vmapped while_loop
    runs all lanes in lockstep until the SLOWEST lane converges, so one
    stubborn packet in a huge batch would make every packet pay its
    iteration count; chunking bounds that straggler blast radius while
    async dispatch keeps the device busy across chunks.
    """
    solve = batched_packet_solve(
        cam, cfg.warp.blur_sigma, cfg.contrast_measure, cfg.optim
    )
    Pn = batch.bearings.shape[0]
    if mesh is not None:
        n_dev = int(mesh.devices.size)
        if Pn % n_dev:
            raise ValueError(f"packet count {Pn} not divisible by mesh size {n_dev}")
        shard = NamedSharding(mesh, P("data"))
        rep = NamedSharding(mesh, P())
        solve = jax.jit(solve, in_shardings=(shard, shard, shard, shard),
                        out_shardings=(rep, rep, rep))
        chunk_size = max((chunk_size // n_dev) * n_dev, n_dev)
    else:
        solve = jax.jit(solve)

    omegas = jnp.zeros((Pn, 3), jnp.float32)
    costs = jnp.zeros(Pn, jnp.float32)
    iters = jnp.zeros(Pn, jnp.int32)
    for sweep in range(max(sweeps, 1)):
        if sweep > 0:
            # Jacobi warm start: neighbor's previous solution.
            omegas = jnp.concatenate([omegas[:1], omegas[:-1]], axis=0)
        outs = []
        for lo in range(0, Pn, chunk_size):
            hi = min(lo + chunk_size, Pn)
            outs.append(solve(
                batch.bearings[lo:hi], batch.dts[lo:hi],
                batch.weights[lo:hi], omegas[lo:hi],
            ))
        omegas = jnp.concatenate([o[0] for o in outs], axis=0)
        costs = jnp.concatenate([o[1] for o in outs], axis=0)
        iters = jnp.concatenate([o[2] for o in outs], axis=0)
    return batch.times, np.asarray(omegas), np.asarray(costs), np.asarray(iters)
