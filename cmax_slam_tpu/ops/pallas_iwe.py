"""Fused Pallas TPU kernel for bilinear vote accumulation.

The XLA path (ops/scatter.py) materializes the per-event hat-weight matrices
Wy (N, H) and Wx (N, W) in HBM — ~(H+W)*4 bytes of traffic per event, which
caps throughput near 90 M ev/s/chip on v5e. This kernel streams event blocks
through VMEM, builds the hat blocks on the VPU, and contracts them on the MXU
into a VMEM-resident accumulator, so HBM traffic drops to the event data
itself (~12 B/event). Grid steps run sequentially on a TPU core, making the
accumulator pattern race-free.

Semantics match scatter.bilinear_accumulate exactly (same in-bounds rule and
floor-parametrized votes as the reference hot loop,
local_image_warped_events.cpp:137-151); a custom VJP reproduces the same
"differentiate only the fractional weights" gradient, also as a Pallas kernel.
Use for images that fit VMEM (local IWEs, small panoramas); the XLA path
remains the fallback for larger maps.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Event block layout per grid step: ROWS x lane events (TPU tiling wants the
# second-to-last dim divisible by 8 and the last by 128). Rows are processed
# with a fori_loop so hat-matrix buffers are reused, keeping VMEM bounded.
# The lane width is a tuning knob: wide lanes amortize loop overhead (local
# IWEs), narrow lanes keep big-pano accumulators + hats inside VMEM.
ROWS = 8
LANE = 2048  # default lane width (fastest measured on v5e that fits VMEM)


def _hats(coords, size, dtype, with_deriv=False):
    """(C,) coords -> (C, size) bilinear hat weights (+ d/dcoord factors)."""
    fl = jnp.floor(coords)
    frac = (coords - fl).astype(dtype)
    cell = fl.astype(jnp.int32)
    grid = jax.lax.broadcasted_iota(jnp.int32, (coords.shape[0], size), 1)
    is0 = (grid == cell[:, None]).astype(dtype)
    is1 = (grid == cell[:, None] + 1).astype(dtype)
    w = (1.0 - frac)[:, None] * is0 + frac[:, None] * is1
    if not with_deriv:
        return w, None
    dw = is1 - is0  # d(weight)/d(coord): the reference's one-sided derivative
    return w, dw


def _sanitize(px, py, weights, height, width):
    fx = jnp.floor(px)
    fy = jnp.floor(py)
    valid = (
        (fx >= 1) & (fx < width - 2) & (fy >= 1) & (fy < height - 2)
        & (weights != 0)
    )
    px = jnp.where(valid, px, -2.0)
    py = jnp.where(valid, py, -2.0)
    w = jnp.where(valid, weights, 0.0)
    return px, py, w


def _fwd_kernel(px_ref, py_ref, w_ref, out_ref, *, height, width, acc_dtype,
                mxu_precision, carry_acc, rows=ROWS, orient="lanes"):
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # Column/row coordinate vectors, hoisted out of the event loop.
    col_x = jax.lax.broadcasted_iota(jnp.int32, (1, width), 1).astype(acc_dtype)
    col_y = jax.lax.broadcasted_iota(jnp.int32, (1, height), 1).astype(acc_dtype)
    row_y = jax.lax.broadcasted_iota(jnp.int32, (height, 1), 0).astype(acc_dtype)
    row_x = jax.lax.broadcasted_iota(jnp.int32, (width, 1), 0).astype(acc_dtype)

    def votes(r):
        px, py, w = _sanitize(
            px_ref[r, :], py_ref[r, :], w_ref[r, :], height, width
        )
        # Forward-only hat: max(0, 1 - |p - col|) — identical values to the
        # floor parametrization at half the VPU ops (the one-sided derivative
        # only matters in the VJP, which _bwd_kernel computes explicitly).
        # Three hat/contraction layouts (the `orient` knob; the default
        # 'lanes' measured 2.1x 'rows' forward and 2.5x fwd+VJP on v5e —
        # examples/tpu_kernel_headroom.py):
        #   rows  — hats (lane, H)/(lane, W), contraction over the SUBLANE
        #           dim of both operands (the original formulation; Mosaic
        #           must relayout the lane-major event vector into sublanes
        #           to build the hats, which dominated the kernel).
        #   mixed — wy built transposed (H, lane) so the contraction is the
        #           MXU-native (M, K) x (K, N) orientation.
        #   lanes — both hats event-major in lanes, A @ B^T contraction; no
        #           event-vector sublane relayout in hat building at all.
        if orient == "rows":
            wx = jnp.maximum(
                0.0, 1.0 - jnp.abs(px.astype(acc_dtype)[:, None] - col_x))
            wy = jnp.maximum(
                0.0, 1.0 - jnp.abs(py.astype(acc_dtype)[:, None] - col_y))
            wy = wy * w.astype(acc_dtype)[:, None]
            return jax.lax.dot_general(
                wy, wx, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )
        if orient == "mixed":
            wx = jnp.maximum(
                0.0, 1.0 - jnp.abs(px.astype(acc_dtype)[:, None] - col_x))
            wyT = jnp.maximum(
                0.0, 1.0 - jnp.abs(row_y - py.astype(acc_dtype)[None, :]))
            wyT = wyT * w.astype(acc_dtype)[None, :]
            return jax.lax.dot_general(
                wyT, wx, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=mxu_precision,
            )
        # orient == "lanes"
        wxT = jnp.maximum(
            0.0, 1.0 - jnp.abs(row_x - px.astype(acc_dtype)[None, :]))
        wyT = jnp.maximum(
            0.0, 1.0 - jnp.abs(row_y - py.astype(acc_dtype)[None, :]))
        wyT = wyT * w.astype(acc_dtype)[None, :]
        return jax.lax.dot_general(
            wyT, wxT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )

    if carry_acc:
        # Small accumulators: loop-carried partial sum (one out_ref update
        # per block — serializing 8 read-modify-writes of out_ref halves
        # throughput on the local-IWE path, measured 191 -> 97 M ev/s).
        out_ref[:] += jax.lax.fori_loop(
            0, rows, lambda r, acc: acc + votes(r), jnp.zeros_like(out_ref)
        )
    else:
        # Big pano crops: accumulate straight into the output ref — the
        # carried partial sum would keep a third (H, W) f32 buffer live and
        # blow the 16 MB VMEM budget.
        def row(r, _):
            out_ref[:] += votes(r)
            return 0

        jax.lax.fori_loop(0, rows, row, 0)


def _bwd_kernel(px_ref, py_ref, w_ref, g_ref, dpx_ref, dpy_ref, dw_ref,
                *, height, width, acc_dtype, mxu_precision):
    """VJP: given upstream d(IWE) (H, W), produce dpx, dpy, dweights.

    Two MXU contractions per row chain the upstream gradient through the hat
    derivatives — the reference's Kronecker-delta gradient votes
    (local_image_warped_events.cpp:162-166) run in reverse.
    """
    g = g_ref[:].astype(acc_dtype)  # (H, W)

    def row(r, _):
        px, py, w = _sanitize(
            px_ref[r, :], py_ref[r, :], w_ref[r, :], height, width
        )
        wx, dwx = _hats(px, width, acc_dtype, with_deriv=True)
        wy, dwy = _hats(py, height, acc_dtype, with_deriv=True)

        # a[e, x] = sum_y wy[e, y] g[y, x]   (C, W)
        a = jax.lax.dot_general(
            wy, g, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )
        # b[e, y] = sum_x wx[e, x] g[y, x]   (C, H)
        b = jax.lax.dot_general(
            wx, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )
        wf = w.astype(jnp.float32)
        dpx_ref[r, :] = wf * jnp.sum(a * dwx.astype(jnp.float32), axis=1)
        dpy_ref[r, :] = wf * jnp.sum(b * dwy.astype(jnp.float32), axis=1)
        dw_ref[r, :] = jnp.sum(a * wx.astype(jnp.float32), axis=1)
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _hats_T(coords, size, dtype, with_deriv=False):
    """(C,) coords -> (size, C) bilinear hat weights, event-major in LANES
    (+ d/dcoord factors). Same floor parametrization as _hats, transposed."""
    fl = jnp.floor(coords)
    frac = (coords - fl).astype(dtype)
    cell = fl.astype(jnp.int32)
    grid = jax.lax.broadcasted_iota(jnp.int32, (size, coords.shape[0]), 0)
    is0 = (grid == cell[None, :]).astype(dtype)
    is1 = (grid == cell[None, :] + 1).astype(dtype)
    w = (1.0 - frac)[None, :] * is0 + frac[None, :] * is1
    if not with_deriv:
        return w, None
    return w, is1 - is0


def _bwd_kernel_lanes(px_ref, py_ref, w_ref, g_ref, gT_ref,
                      dpx_ref, dpy_ref, dw_ref,
                      *, height, width, acc_dtype, mxu_precision):
    """Lanes-orientation VJP: hats are built event-major in LANES (no
    sublane relayout of the event vector) and both contractions run in the
    MXU-native (M, K) x (K, N) orientation against the upstream gradient —
    g for one, its pre-transposed copy gT (transposed ONCE per VJP call by
    XLA, not per grid step) for the other. Same gradient semantics as
    _bwd_kernel; picked by measurement (examples/tpu_kernel_headroom.py)."""
    g = g_ref[:].astype(acc_dtype)    # (H, W)
    gT = gT_ref[:].astype(acc_dtype)  # (W, H)

    def row(r, _):
        px, py, w = _sanitize(
            px_ref[r, :], py_ref[r, :], w_ref[r, :], height, width
        )
        wxT, dwxT = _hats_T(px, width, acc_dtype, with_deriv=True)
        wyT, dwyT = _hats_T(py, height, acc_dtype, with_deriv=True)

        # aT[x, e] = sum_y g[y, x] wyT[y, e]   (W, C)
        aT = jax.lax.dot_general(
            gT, wyT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )
        # bT[y, e] = sum_x g[y, x] wxT[x, e]   (H, C)
        bT = jax.lax.dot_general(
            g, wxT, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )
        wf = w.astype(jnp.float32)
        dpx_ref[r, :] = wf * jnp.sum(aT * dwxT.astype(jnp.float32), axis=0)
        dpy_ref[r, :] = wf * jnp.sum(bT * dwyT.astype(jnp.float32), axis=0)
        dw_ref[r, :] = jnp.sum(aT * wxT.astype(jnp.float32), axis=0)
        return 0

    jax.lax.fori_loop(0, ROWS, row, 0)


def _pad_blocks(px, py, weights, lane, rows=ROWS):
    n = px.shape[0]
    block = rows * lane
    pad = (-n) % block
    if pad:
        px = jnp.pad(px, (0, pad))
        py = jnp.pad(py, (0, pad))
        weights = jnp.pad(weights, (0, pad))
    blocks = px.shape[0] // block
    shape = (blocks * rows, lane)
    return px.reshape(shape), py.reshape(shape), weights.reshape(shape), blocks, n


def _ev_spec(lane, rows=ROWS):
    return pl.BlockSpec((rows, lane), lambda k: (k, 0), memory_space=pltpu.VMEM)


def _resolve(precision: str):
    """precision 'highest' -> f32-accurate MXU passes; 'high' -> ~3-pass
    (f32-ish, ~2x faster); 'default' -> fast single pass (bf16-rounded
    inputs, ~3x faster, rel err ~1e-3)."""
    if precision == "highest":
        return jnp.float32, jax.lax.Precision.HIGHEST
    if precision == "high":
        return jnp.float32, jax.lax.Precision.HIGH
    return jnp.float32, jax.lax.Precision.DEFAULT


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def bilinear_accumulate_pallas(
    px, py, weights, height: int, width: int, precision: str = "highest",
    lane: int = LANE, rows: int = ROWS, orient: str = "lanes",
):
    """Drop-in Pallas replacement for scatter.bilinear_accumulate."""
    return _fwd_impl(px, py, weights, height, width, precision, lane, rows,
                     orient)


def _fwd_impl(px, py, weights, height, width, precision, lane, rows=ROWS,
              orient="lanes"):
    acc_dtype, mxu = _resolve(precision)
    px2, py2, w2, blocks, _ = _pad_blocks(
        px.astype(jnp.float32), py.astype(jnp.float32),
        weights.astype(jnp.float32), lane, rows,
    )
    kernel = functools.partial(
        _fwd_kernel, height=height, width=width, acc_dtype=acc_dtype,
        mxu_precision=mxu,
        carry_acc=vmem_fits(height, width, lane, with_carry=True),
        rows=rows, orient=orient,
    )
    return pl.pallas_call(
        kernel,
        grid=(blocks,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_ev_spec(lane, rows)] * 3,
        out_specs=pl.BlockSpec(
            (height, width), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((height, width), jnp.float32),
    )(px2, py2, w2)


def _vjp_fwd(px, py, weights, height, width, precision, lane, rows, orient):
    out = _fwd_impl(px, py, weights, height, width, precision, lane, rows,
                    orient)
    return out, (px, py, weights)


def _vjp_bwd(height, width, precision, lane, rows, orient, res, g):
    px, py, weights = res
    n = px.shape[0]
    acc_dtype, mxu = _resolve(precision)
    # The backward keeps far more VMEM live than the forward (the upstream
    # (H, W) block is double-buffered, plus hats AND their derivatives AND two
    # contraction results), so it picks its own lane; when even lane 128
    # cannot fit (big pano crops), chain through the XLA chunked vote path —
    # same floor-parametrized gradient semantics (ops/scatter.py).
    lane = pick_bwd_lane(height, width)
    if lane == 0:
        from .scatter import bilinear_accumulate

        _, pull = jax.vjp(
            lambda a, b, c: bilinear_accumulate(
                a, b, c, height=height, width=width, precision=precision
            ),
            px, py, weights,
        )
        return pull(g)
    px2, py2, w2, blocks, _ = _pad_blocks(
        px.astype(jnp.float32), py.astype(jnp.float32),
        weights.astype(jnp.float32), lane,
    )
    img_spec = pl.BlockSpec((height, width), lambda k: (0, 0),
                            memory_space=pltpu.VMEM)
    if orient == "lanes":
        kernel = functools.partial(
            _bwd_kernel_lanes, height=height, width=width,
            acc_dtype=acc_dtype, mxu_precision=mxu,
        )
        imgT_spec = pl.BlockSpec((width, height), lambda k: (0, 0),
                                 memory_space=pltpu.VMEM)
        g32 = g.astype(jnp.float32)
        extra_in = [imgT_spec]
        args = (px2, py2, w2, g32, g32.T)
    else:
        kernel = functools.partial(
            _bwd_kernel, height=height, width=width, acc_dtype=acc_dtype,
            mxu_precision=mxu,
        )
        extra_in = []
        args = (px2, py2, w2, g.astype(jnp.float32))
    dpx, dpy, dw = pl.pallas_call(
        kernel,
        grid=(blocks,),
        interpret=jax.default_backend() != "tpu",
        in_specs=[_ev_spec(lane), _ev_spec(lane), _ev_spec(lane), img_spec,
                  *extra_in],
        out_specs=[_ev_spec(lane), _ev_spec(lane), _ev_spec(lane)],
        out_shape=[
            jax.ShapeDtypeStruct((blocks * ROWS, lane), jnp.float32),
            jax.ShapeDtypeStruct((blocks * ROWS, lane), jnp.float32),
            jax.ShapeDtypeStruct((blocks * ROWS, lane), jnp.float32),
        ],
    )(*args)
    return (
        dpx.reshape(-1)[:n].astype(px.dtype),
        dpy.reshape(-1)[:n].astype(py.dtype),
        dw.reshape(-1)[:n].astype(weights.dtype),
    )


bilinear_accumulate_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def vmem_fits(height: int, width: int, lane: int = LANE,
              budget_bytes: int = 13 * 1024 * 1024 + 512 * 1024,
              with_carry: bool = False) -> bool:
    """Whether the FORWARD kernel's live VMEM fits the 16 MB/core budget:
    out_ref + the dot result (2 accumulator copies; 3 with the loop-carried
    partial sum of the fast small-image variant) + the hat live set — wx
    (lane, W) plus wy AND its weighted product (2 x (lane, H)).
    Coefficients validated against Mosaic's scoped-vmem accounting on v5e:
    384x640 at lane 2048 with carry measured 17.32 MB (model 15.98 — the
    conservative 13.5 MB budget absorbs the residual underestimate);
    a 1024x1280 crop at lane 128 with carry measured 17.9 MB (reject);
    240x180 at lane 2048 with carry runs (the 190 M ev/s bench kernel)."""
    acc = height * ((width + 127) // 128 * 128) * 4
    pair = (width + 2 * height) * 4
    misc = 1 * 1024 * 1024  # event blocks (double-buffered), semaphores, slack
    copies = 3 if with_carry else 2
    return copies * acc + lane * pair + misc < budget_bytes


def pick_bwd_lane(height: int, width: int,
                  budget_bytes: int = 15 * 1024 * 1024) -> int:
    """Widest lane the BACKWARD kernel fits at; 0 -> caller chains through
    the XLA vote path. Live set: the upstream (H, W) block (double-buffered,
    plus one arithmetic copy) AND its pre-transposed (W, H) copy for the
    lanes-orientation contraction (4 acc copies total), hats + derivative
    hats (2 pairs) and the two contraction results (1 pair) with their f32
    casts (~6 pairs total). Calibrated on v5e: 1024x1280 at lane 256
    measured 31.3 MB -> reject; the 180x240 local IWE at lane 1024 runs
    (11.9 MB predicted at 3 copies; the 4th adds 0.18 MB there)."""
    acc = height * ((width + 127) // 128 * 128) * 4
    pair = (height + width) * 4
    misc = 1 * 1024 * 1024
    for lane in (1024, 512, 256, 128):
        if 4 * acc + 6 * lane * pair + misc < budget_bytes:
            return lane
    return 0


def pick_lane(height: int, width: int) -> int:
    """Widest lane (of 2048..128) that keeps the kernel in VMEM;
    0 when even 128 lanes do not fit (caller should use the XLA path)."""
    for lane in (2048, 1024, 512, 256, 128):
        if vmem_fits(height, width, lane):
            return lane
    return 0
