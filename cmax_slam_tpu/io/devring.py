"""Device-resident event ring for the front-end hot path.

The reference re-reads each event from the host event vector for every
packet it appears in (overlapping centered packets share ~ packet - stride
events; src/frontend/ang_vel_estimator.cpp:137-147 copies the slice per
packet). The earlier TPU path mirrored that host-side: each stride
marshalled its packets into a (P, 4, S) float32 tensor and uploaded it,
so at ECRot-shed geometry (20k-event packets every 5k events) every event
crossed the host->device link ~4x at 16 B each — measured as 75% of the
front-end stride wall cost over a remote-device link
(examples/tpu_fe_host_decomp.py).

This module instead uploads each event ONCE, in a compact 8 B encoding
(precomputed bearing-LUT index int32 + epoch-relative float32 timestamp),
into a fixed-capacity power-of-two device ring; the stride solver gathers
its overlapping packets directly from the ring on device (frontend.py).
Absolute event index ``a`` lives at ring position ``a & (capacity-1)``,
so all host bookkeeping stays in the EventStore's absolute indices and
prefix retirement needs no device work at all (old entries are simply
overwritten). If a reader ever reaches back further than the capacity
(giant single-call pushes), the front-end falls back to the host-marshal
path for that stride — correctness never depends on ring residency.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _next_pow2(n: int) -> int:
    p = 1
    while p < n:
        p <<= 1
    return p


@functools.partial(jax.jit, static_argnames=("cap",), donate_argnums=(0, 1))
def _ring_write(idx_buf, ts_buf, idx_new, ts_new, pos, n, cap: int):
    """Scatter a padded chunk into the ring at absolute position ``pos``.

    Padded lanes (>= n) target index ``cap`` and are dropped by the scatter
    (mode="drop"), so one compiled program serves every chunk length within
    a pad bucket. Buffers are donated: an append is an in-place HBM update,
    not a copy of the ring.
    """
    lane = jnp.arange(idx_new.shape[0], dtype=jnp.int32)
    wpos = jnp.where(lane < n, (pos + lane) & (cap - 1), cap)
    idx_buf = idx_buf.at[wpos].set(idx_new, mode="drop")
    ts_buf = ts_buf.at[wpos].set(ts_new, mode="drop")
    return idx_buf, ts_buf


class DeviceEventRing:
    """Fixed-capacity device mirror of the EventStore's front-end view.

    Stores per event: ``idx = y*width + x`` (the bearing-LUT flat index,
    int32) and the epoch-relative float32 timestamp — exactly the two
    quantities the packet objective consumes, in the exact dtypes the old
    host-marshal path produced, so solver numerics are bit-identical.
    """

    #: pad buckets for append chunk sizes (bounds the compile cache)
    _MIN_BUCKET = 4096

    def __init__(self, capacity: int, img_width: int):
        if capacity & (capacity - 1):
            raise ValueError("ring capacity must be a power of two")
        self.capacity = capacity
        self.img_width = img_width
        self._idx = jnp.zeros((capacity,), jnp.int32)
        self._ts = jnp.zeros((capacity,), jnp.float32)
        self.hi = 0  # absolute index of the next write

    @property
    def buffers(self):
        return self._idx, self._ts

    def resident(self, abs_beg: int) -> bool:
        """True if absolute indices [abs_beg, hi) are still in the ring."""
        return self.hi - abs_beg <= self.capacity

    def _bucket(self, n: int) -> int:
        return max(_next_pow2(n), self._MIN_BUCKET)

    def append(self, xs, ys, ts_rel) -> None:
        """Upload one stream chunk (ONE host->device transfer + program).

        ``ts_rel`` must already be epoch-relative float32-representable
        times (the front-end passes ``(ts - t0)``); ``xs``/``ys`` integer
        pixel coordinates. Chunks larger than half the capacity are split
        so a single append can never lap its own unread head.
        """
        n = len(ts_rel)
        half = self.capacity // 2
        off = 0
        while n - off > half:
            self._append_one(xs[off:off + half], ys[off:off + half],
                             ts_rel[off:off + half])
            off += half
        if n - off:
            self._append_one(xs[off:], ys[off:], ts_rel[off:])

    def _append_one(self, xs, ys, ts_rel) -> None:
        n = len(ts_rel)
        k = self._bucket(n)
        idx = np.zeros(k, np.int32)
        np.add(
            np.multiply(np.asarray(ys, np.int32), self.img_width,
                        dtype=np.int32),
            np.asarray(xs, np.int32), out=idx[:n],
        )
        tsb = np.zeros(k, np.float32)
        tsb[:n] = ts_rel
        self._idx, self._ts = _ring_write(
            self._idx, self._ts, jnp.asarray(idx), jnp.asarray(tsb),
            np.int32(self.hi & (self.capacity - 1)), np.int32(n),
            self.capacity,
        )
        self.hi += n

    def resync(self, store, t0: float) -> None:
        """Rebuild the ring from the EventStore's resident window (used
        after checkpoint restore; the ring itself is never serialized)."""
        self._idx = jnp.zeros((self.capacity,), jnp.int32)
        self._ts = jnp.zeros((self.capacity,), jnp.float32)
        self.hi = store.base
        xs, ys, ts, _ = store.slice_abs(store.base, store.total)
        if len(ts):
            self.append(xs, ys, (ts - t0).astype(np.float32))
