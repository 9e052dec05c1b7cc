"""Bounded-memory streaming ingestion (io/streams.py).

The reference consumes an unbounded live topic (src/cmax_slam.cpp:147-161);
these tests check the streaming iterators yield exactly what the whole-file
loaders produce, in order, chunk-bounded, for every format."""

import io

import numpy as np
import pytest

from cmax_slam_tpu.io import events as ev_io
from cmax_slam_tpu.io import streams
from test_io import _event_array_msg, _write_test_bag


def _write_txt(path, n=1000):
    rng = np.random.default_rng(3)
    ts = np.sort(rng.uniform(0, 1, n))
    xs = rng.integers(0, 240, n)
    ys = rng.integers(0, 180, n)
    ps = rng.choice([0, 1], n)
    with open(path, "w") as f:
        for t, x, y, p in zip(ts, xs, ys, ps):
            f.write(f"{t:.9f} {x} {y} {p}\n")
    return path


def _collect(it):
    chunks = list(it)
    assert chunks, "no chunks yielded"
    return tuple(np.concatenate(a) for a in zip(*chunks)), chunks


def test_txt_stream_matches_loader(tmp_path):
    p = _write_txt(str(tmp_path / "ev.txt"))
    ref = ev_io.load_events(p)
    (xs, ys, ts, ps), chunks = _collect(streams.iter_events(p, chunk_events=128))
    assert all(len(c[2]) <= 128 for c in chunks)
    assert len(chunks) >= 7  # actually chunked, not one big read
    for a, b in zip(ref, (xs, ys, ts, ps)):
        np.testing.assert_array_equal(a, b)


def test_txt_stream_max_events(tmp_path):
    p = _write_txt(str(tmp_path / "ev.txt"))
    (xs, _, ts, _), _ = _collect(
        streams.iter_events(p, chunk_events=128, max_events=300))
    assert len(xs) == 300
    ref = ev_io.load_events(p, max_events=300)
    np.testing.assert_array_equal(ref[2], ts)


def test_zip_stream_matches_loader(tmp_path):
    import zipfile

    txt = _write_txt(str(tmp_path / "ev.txt"))
    zp = str(tmp_path / "ev.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.write(txt, "events.txt")
    ref = ev_io.load_events(zp)
    (xs, ys, ts, ps), chunks = _collect(streams.iter_events(zp, chunk_events=256))
    assert len(chunks) >= 4
    for a, b in zip(ref, (xs, ys, ts, ps)):
        np.testing.assert_array_equal(a, b)


def test_text_fileobj_stream_live_feed():
    """iter_events_text over an in-memory pipe: the live-ingestion analog
    (stdin/socket feed) of the reference's event subscriber."""
    lines = "".join(
        f"{i * 0.001:.6f} {i % 30} {i % 20} {i % 2}\n" for i in range(500)
    )
    out, chunks = _collect(streams.iter_events_text(io.StringIO(lines), 64))
    assert len(chunks) == 8  # 500/64 rounded up, bounded reads
    assert len(out[2]) == 500
    np.testing.assert_allclose(out[2][:3], [0.0, 0.001, 0.002])
    assert set(np.unique(out[3])) <= {-1, 1}


def test_bag_stream_matches_loader_and_reorders(tmp_path):
    """Bag streaming yields the global-sort result despite message-level
    timestamp wobble (the reorder cushion)."""
    from cmax_slam_tpu.io import rosbag

    rng = np.random.default_rng(5)
    msgs = []
    t0 = 0.0
    for k in range(40):
        n = int(rng.integers(5, 30))
        ts = np.sort(t0 + rng.uniform(0, 0.01, n))
        # adjacent messages overlap slightly in time (wobble)
        t0 = float(ts[-1]) - 0.002
        msgs.append(_event_array_msg(
            rng.integers(0, 240, n), rng.integers(0, 180, n), ts,
            rng.choice([-1, 1], n)))
    p = str(tmp_path / "stream.bag")
    _write_test_bag(p, msgs)

    ref = rosbag.read_rosbag_events(p)  # globally sorted whole-file read
    (xs, ys, ts, ps), chunks = _collect(streams.iter_events(p, chunk_events=64))
    assert len(chunks) >= 4
    assert np.all(np.diff(ts) >= 0), "streamed chunks out of order"
    np.testing.assert_allclose(ts, ref[2], atol=1e-9)
    # same multiset of events (stable sort may tie-break equal stamps
    # differently across implementations)
    np.testing.assert_array_equal(np.sort(xs), np.sort(ref[0]))


def test_bag_stream_topic_filter_and_missing(tmp_path):
    p = str(tmp_path / "none.bag")
    _write_test_bag(p, [_event_array_msg([1], [2], [0.1], [1])],
                    conns=[("/other", "std_msgs/String")])
    with pytest.raises(ValueError):
        list(streams.iter_events(p))


def test_cli_runs_on_streamed_txt(tmp_path):
    """End-to-end: the CLI replays a txt recording through the streaming
    path (no whole-file load) and produces outputs."""
    from cmax_slam_tpu import cli
    from cmax_slam_tpu.io import synthetic

    W, H, FXY = 120, 90, 90.0
    rng = np.random.default_rng(11)
    ev = synthetic.rotating_camera_events(
        rng, 40_000, 0.2, np.array([0.8, -1.0, 1.4]), FXY, FXY, W / 2, H / 2,
        W, H, n_points=250,
    )
    evp = tmp_path / "events.txt"
    with open(evp, "w") as f:
        for t, x, y, p in zip(ev.ts, ev.xs, ev.ys, ev.pols):
            f.write(f"{t:.9f} {x} {y} {max(p, 0)}\n")
    calp = tmp_path / "calib.txt"
    calp.write_text(f"{FXY} {FXY} {W/2} {H/2} 0 0 0 0 0\n")
    out = tmp_path / "out"
    rc = cli.main([
        "--events", str(evp), "--calib", str(calp),
        "--width", str(W), "--height", str(H),
        "--chunk-size", "8192", "--no-backend",
        "--out-dir", str(out),
        "--set", "frontend.num_events_per_packet=6000",
        "--set", "frontend.dt_ang_vel=0.02",
    ])
    assert rc == 0
    av = np.loadtxt(out / "angular_velocity.txt")
    assert len(av) >= 5
