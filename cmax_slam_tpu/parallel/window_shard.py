"""Event-parallel multi-chip bundle adjustment: ONE window's CMax objective
sharded over a device mesh.

The reference's back-end is strictly single-threaded (SURVEY.md section 2.3);
the segmented replay (parallel/replay.py) parallelizes across TIME. This
module adds the orthogonal axis: parallelize WITHIN one window by splitting
its event batches across chips. Each device warps its shard of events through
the (replicated) window sub-spline and accumulates a partial vote image; one
``psum`` over ICI produces the full IWE, and the blend + blur + contrast run
replicated. Reverse-mode autodiff flows straight through ``shard_map`` +
``psum``, so the same FR-CG solver optimizes the sharded objective unchanged.

Communication cost per objective evaluation: one (H, W) float32 all-reduce —
at ECRot scale (2048 x 4096 = 32 MiB) well under a millisecond on a v5e ICI
ring — against an O(N/n_dev) reduction in per-device warp + scatter work, the
dominant cost of a 130k-event window. This is the lever that takes a big
window below the streaming stride when more than one chip is available
(reference hot loop: src/backend/event_pano_warper.cpp:233-336).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..calib import EquirectCamera
from ..ops import warp_pano
from ..ops.blur import gaussian_blur
from ..ops.contrast import contrast
from ..ops.warp_pano import PanoWindow

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def shard_window_events(win: PanoWindow, mesh: Mesh, axis: str = "data"
                        ) -> PanoWindow:
    """Pad the window's event-batch axis to a mesh multiple and device_put
    the per-event arrays with batch-axis sharding (everything else
    replicated). Padding batches carry weight 0, so they vote nothing."""
    n_dev = int(mesh.devices.size)
    B = win.batch_times.shape[0]
    E = win.weights.shape[0] // B
    pad_b = (-B) % n_dev
    if pad_b:
        pe = pad_b * E
        # Pad bearings with a nonzero constant ray ((1,1,1) columns on the
        # component-major (3, N) layout), NOT zeros: the equirect projection
        # divides by ||bearing|| and a zero ray makes arcsin(0/0) = NaN,
        # which the weight-0 vote then spreads as 0*NaN = NaN into the
        # partial image (surfaced at B=1300 on an 8-device mesh).
        win = win._replace(
            bearings=jnp.pad(win.bearings, ((0, 0), (0, pe)),
                             constant_values=((0, 0), (0, 1))),
            batch_times=jnp.pad(win.batch_times, (0, pad_b)),
            weights=jnp.pad(win.weights, (0, pe)),
            is_old=jnp.pad(win.is_old, (0, pe)),
        )
    ev_sh = NamedSharding(mesh, P(None, axis))  # (3, N): split events
    vec_sh = NamedSharding(mesh, P(axis))       # (B,) and (N,): batch-major
    rep = NamedSharding(mesh, P())
    return PanoWindow(
        bearings=jax.device_put(win.bearings, ev_sh),
        batch_times=jax.device_put(win.batch_times, vec_sh),
        weights=jax.device_put(win.weights, vec_sh),
        is_old=jax.device_put(win.is_old, vec_sh),
        knots=jax.device_put(win.knots, rep),
        free_mask=jax.device_put(win.free_mask, rep),
        t0=win.t0, dt_knots=win.dt_knots,
        ig_prime=jax.device_put(win.ig_prime, rep),
        alpha=win.alpha,
    )


def make_sharded_pano_objective(
    mesh: Mesh,
    win: PanoWindow,
    pano: EquirectCamera,
    order: int,
    blur_sigma: float,
    measure: int,
    precision: str = "highest",
    axis: str = "data",
):
    """(f, value_and_grad) over flattened knot increments R^{3K}, numerically
    equal to warp_pano.make_pano_objective but with the event work split
    across the mesh and ONE psum of the partial vote images per evaluation.

    ``win``'s event-batch axis must divide the mesh size (use
    shard_window_events). The knots/maps are replicated; the returned
    callables close over the window and are jit-compatible.
    """
    K = win.knots.shape[0]
    B = win.batch_times.shape[0]
    n_dev = int(mesh.devices.size)
    assert B % n_dev == 0, f"batch axis {B} not divisible by mesh {n_dev}"

    ev_spec = P(None, axis)
    b_spec = P(axis)
    rep = P()

    @jax.jit
    def f(flat_drotv):
        drotv = flat_drotv.reshape(K, 3)

        def local(drotv_r, bearings, batch_times, weights, knots, free_mask,
                  ig_prime):
            w = win._replace(
                bearings=bearings, batch_times=batch_times, weights=weights,
                knots=knots, free_mask=free_mask, ig_prime=ig_prime,
            )
            px, py = warp_pano.warp_to_pano(drotv_r, w, pano, order)
            il_part = warp_pano._accumulate_total(px, py, weights, pano,
                                                  precision)
            il = jax.lax.psum(il_part, axis)
            image = gaussian_blur(il + win.alpha * ig_prime, blur_sigma,
                                  precision=precision)
            return -contrast(image, measure)

        return shard_map(
            local, mesh=mesh,
            in_specs=(rep, ev_spec, b_spec, b_spec, rep, rep, rep),
            out_specs=rep,
        )(drotv, win.bearings, win.batch_times, win.weights, win.knots,
          win.free_mask, win.ig_prime)

    return f, jax.jit(jax.value_and_grad(f))
