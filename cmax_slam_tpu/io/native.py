"""ctypes bindings for the native event-stream runtime (native/evstream.cpp).

The hot host-side paths — text-event parsing, packet-trigger scanning,
window search, packet gather+pad — run in C++ when libevstream.so is built
(`make -C native`), with pure-numpy fallbacks otherwise. This is the rebuild's
analog of the reference's C++ data plane (the ROS subscriber + per-event
bookkeeping the reference spends its callback thread on).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libevstream.so")


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO_PATH):
        try:  # best-effort build
            subprocess.run(
                ["make", "-C", _NATIVE_DIR, "-s"], check=True, capture_output=True,
                timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
    except OSError:
        return None

    lib.evs_parse_txt.restype = ctypes.c_int64
    lib.evs_parse_txt.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.c_int64,
    ]
    lib.evs_scan_triggers.restype = ctypes.c_int64
    lib.evs_scan_triggers.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int64),
        ctypes.c_double, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
    ]
    lib.evs_window.restype = None
    lib.evs_window.argtypes = [
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.evs_gather_packet.restype = None
    lib.evs_gather_packet.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
        ctypes.c_double, ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_events_txt(path: str, max_events: int = -1):
    """Fast parse of 't x y p' text event files; falls back to numpy."""
    lib = _load()
    if lib is None:
        from .events import read_events_txt

        return read_events_txt(path, None if max_events < 0 else max_events)

    n = lib.evs_parse_txt(path.encode(), None, None, None, None, max_events)
    if n < 0:
        raise IOError(f"failed to parse {path}")
    ts = np.empty(n, np.float64)
    xs = np.empty(n, np.int32)
    ys = np.empty(n, np.int32)
    ps = np.empty(n, np.int8)
    n2 = lib.evs_parse_txt(
        path.encode(), _ptr(ts, ctypes.c_double), _ptr(xs, ctypes.c_int32),
        _ptr(ys, ctypes.c_int32), _ptr(ps, ctypes.c_int8), n,
    )
    assert n2 == n
    return xs, ys, ts, ps


def scan_triggers(
    ts: np.ndarray, cursor: float, next_idx: int, dt: float, max_out: int = 65536
) -> Tuple[np.ndarray, float, int]:
    """Packet-trigger scan (front-end cursor walk). Returns
    (trigger_indices, new_cursor, new_next_idx)."""
    lib = _load()
    ts = np.ascontiguousarray(ts, np.float64)
    if lib is None:
        out = []
        i = next_idx
        n = len(ts)
        while i < n:
            idx = int(np.searchsorted(ts, cursor, side="right"))
            idx = max(idx, i)
            if idx >= n:
                i = n
                break
            out.append(idx)
            cursor += dt
            i = idx + 1
        return np.asarray(out, np.int64), cursor, i

    c = ctypes.c_double(cursor)
    nx = ctypes.c_int64(next_idx)
    out = np.empty(max_out, np.int64)
    k = lib.evs_scan_triggers(
        _ptr(ts, ctypes.c_double), len(ts), ctypes.byref(c), ctypes.byref(nx),
        dt, _ptr(out, ctypes.c_int64), max_out,
    )
    return out[:k].copy(), c.value, nx.value


def window(ts: np.ndarray, t_beg: float, t_end: float) -> Tuple[int, int]:
    lib = _load()
    ts = np.ascontiguousarray(ts, np.float64)
    if lib is None:
        return (
            int(np.searchsorted(ts, t_beg, side="left")),
            int(np.searchsorted(ts, t_end, side="left")),
        )
    lo = ctypes.c_int64()
    hi = ctypes.c_int64()
    lib.evs_window(_ptr(ts, ctypes.c_double), len(ts), t_beg, t_end,
                   ctypes.byref(lo), ctypes.byref(hi))
    return lo.value, hi.value


def gather_packet(
    xs: np.ndarray, ys: np.ndarray, ts: np.ndarray, beg: int, end: int,
    cap: int, lut: np.ndarray, width: int, t0: float,
):
    """Fused LUT gather + pad into fixed-size packet buffers."""
    lib = _load()
    if lib is None:
        n = min(end - beg, cap)
        bearings = np.zeros((cap, 3), np.float32)
        bearings[:, 2] = 1.0
        idx = ys[beg : beg + n].astype(np.int64) * width + xs[beg : beg + n]
        bearings[:n] = lut[idx]
        ts_rel = np.zeros(cap, np.float32)
        ts_rel[:n] = (ts[beg : beg + n] - t0).astype(np.float32)
        w = np.zeros(cap, np.float32)
        w[:n] = 1.0
        return bearings, ts_rel, w

    xs = np.ascontiguousarray(xs, np.int32)
    ys = np.ascontiguousarray(ys, np.int32)
    ts = np.ascontiguousarray(ts, np.float64)
    lut = np.ascontiguousarray(lut, np.float32)
    bearings = np.empty((cap, 3), np.float32)
    ts_rel = np.empty(cap, np.float32)
    w = np.empty(cap, np.float32)
    lib.evs_gather_packet(
        _ptr(xs, ctypes.c_int32), _ptr(ys, ctypes.c_int32),
        _ptr(ts, ctypes.c_double), beg, end, cap,
        _ptr(lut, ctypes.c_float), width, t0,
        _ptr(bearings, ctypes.c_float), _ptr(ts_rel, ctypes.c_float),
        _ptr(w, ctypes.c_float),
    )
    return bearings, ts_rel, w
