"""Multi-chip scaling: data-parallel CMax over a device mesh.

The reference has no distributed execution (SURVEY.md section 2.3 — its only
concurrency is a 2-thread producer/consumer pipeline). The TPU-native design
adds the one distributed axis that matters for this workload: DATA parallelism
over independent event packets/windows — many angular-velocity solves (or
batched multi-window replays) run simultaneously, sharded across chips over
ICI with `jax.sharding`. There is no inter-chip communication in the hot
loop (each packet's solve is independent); XLA inserts nothing but the final
gather, so scaling is linear by construction.
"""

from __future__ import annotations


import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import OptimOptions
from ..ops import optim, warp_local
from ..ops.contrast import contrast


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def batched_packet_solve(
    cam: warp_local.CameraParams,
    blur_sigma: float = 1.0,
    measure: int = 0,
    opt: OptimOptions = OptimOptions(),
    impl: str = "xla",
):
    """Returns f(batched packet arrays, omega0s) -> (omegas, costs, iters):
    a vmapped whole-solve CMax step, the unit of data parallelism.

    Defaults to the XLA vote path: its batched matmuls vmap into bigger,
    MXU-friendlier contractions, while vmapping the VMEM-resident Pallas
    kernel multiplies its scratch footprint past the v5e VMEM budget."""

    def solve_one(bearings, dts, weights, omega0):
        packet = warp_local.EventPacket(bearings, dts, weights)

        def f(omega):
            iwe = warp_local.local_iwe(omega, packet, cam, blur_sigma,
                                       impl=impl)
            return -contrast(iwe, measure)

        res = optim.minimize_fr_cg(
            jax.value_and_grad(f), omega0, f_fn=f,
            max_line_searches=opt.max_line_searches,
            initial_step=opt.initial_step,
            line_search_tol=opt.line_search_tol,
            grad_tol=opt.grad_tol,
            fun_tol=opt.fun_tol,
            max_fevals_per_linesearch=opt.max_fevals_per_linesearch,
            stagnation_patience=opt.stagnation_patience,
            secant_refine_evals=opt.secant_refine_evals,
            ladder=opt.ladder,
            cg_variant=opt.cg_variant,
        )
        return res.x, res.fun, res.iters

    return jax.vmap(solve_one)


def make_dp_cmax_step(
    mesh: Mesh,
    cam: warp_local.CameraParams,
    blur_sigma: float = 1.0,
    measure: int = 0,
    opt: OptimOptions = OptimOptions(),
    axis: str = "data",
):
    """jit the batched CMax solve with batch-dim sharding over the mesh.

    Input arrays must have a leading batch axis divisible by the mesh size;
    each device runs its packets' full optimization locally (ICI idle in the
    hot loop — embarrassingly parallel throughput scaling, the TPU analog of
    the reference's live-mode load shedding knobs).
    """
    batched = batched_packet_solve(cam, blur_sigma, measure, opt)
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())

    return jax.jit(
        batched,
        in_shardings=((shard, shard, shard, shard)),
        out_shardings=(rep, rep, rep),
    )
