"""IO layer: EventStore, file readers, native bindings, rosbag decode,
image writers, trajectory evaluation."""

import os
import struct
import numpy as np
import pytest

from cmax_slam_tpu.io import events as ev_io
from cmax_slam_tpu.io import native, rosbag
from cmax_slam_tpu.utils import evaluate, image


def test_event_store_absolute_indexing():
    s = ev_io.EventStore()
    s.append([1, 2], [3, 4], [0.1, 0.2], [1, -1])
    s.append([5], [6], [0.3], [1])
    assert s.total == 3
    xs, ys, ts, ps = s.slice_abs(1, 3)
    np.testing.assert_array_equal(xs, [2, 5])
    s.drop_before(2)
    assert s.base == 2
    xs, _, _, _ = s.slice_abs(1, 3)  # clipped to stored range
    np.testing.assert_array_equal(xs, [5])
    assert s.searchsorted_time(0.25) == 2
    with pytest.raises(ValueError):
        s.append([1], [1], [0.05], [1])  # out of order


def test_txt_reader_roundtrip(tmp_path):
    p = str(tmp_path / "events.txt")
    with open(p, "w") as f:
        for i in range(10):
            f.write(f"{i*0.001:.6f} {i} {i+1} {i%2}\n")
    xs, ys, ts, ps = ev_io.read_events_txt(p)
    np.testing.assert_array_equal(xs, np.arange(10))
    np.testing.assert_array_equal(ps[::2], -1)
    # native parser agrees
    if native.available():
        xs2, ys2, ts2, ps2 = native.parse_events_txt(p)
        np.testing.assert_array_equal(xs2, xs)
        np.testing.assert_allclose(ts2, ts)
        np.testing.assert_array_equal(ps2, ps)


def test_native_trigger_scan_matches_python():
    rng = np.random.default_rng(0)
    ts = np.sort(rng.uniform(0, 1.0, 500))
    # python fallback
    out_py = []
    cursor, i = 0.05, 0
    c2, i2 = cursor, i
    while i < len(ts):
        idx = int(np.searchsorted(ts, cursor, side="right"))
        idx = max(idx, i)
        if idx >= len(ts):
            break
        out_py.append(idx)
        cursor += 0.01
        i = idx + 1
    trig, c, nxt = native.scan_triggers(ts, c2, i2, 0.01)
    np.testing.assert_array_equal(trig, out_py)


def _write_test_bag(path, msgs, compression="none", conns=None):
    """Serialize a minimal v2.0 bag. ``msgs`` entries are raw payloads for
    connection 0 (the default /dvs/events EventArray) or (conn_id, raw)
    tuples; ``conns`` optionally overrides the connection table as a list of
    (topic, msg_type)."""
    import bz2 as _bz2

    def header(fields):
        out = b""
        for k, v in fields.items():
            f = k + b"=" + v
            out += struct.pack("<I", len(f)) + f
        return out

    def record(fields, data):
        h = header(fields)
        return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data

    if conns is None:
        conns = [("/dvs/events", "dvs_msgs/EventArray")]
    conn_rec = b""
    for cid, (topic, mtype) in enumerate(conns):
        conn_rec += record(
            {b"op": b"\x07", b"conn": struct.pack("<I", cid),
             b"topic": topic.encode()},
            header({b"type": mtype.encode(), b"md5sum": b"x",
                    b"message_definition": b""}),
        )
    msg_recs = b""
    for m in msgs:
        cid, raw = m if isinstance(m, tuple) else (0, m)
        msg_recs += record(
            {b"op": b"\x02", b"conn": struct.pack("<I", cid),
             b"time": struct.pack("<II", 0, 0)},
            raw,
        )
    chunk_payload = conn_rec + msg_recs
    if compression == "bz2":
        comp = _bz2.compress(chunk_payload)
    else:
        comp = chunk_payload
    chunk_rec = record(
        {b"op": b"\x05", b"compression": compression.encode(),
         b"size": struct.pack("<I", len(chunk_payload))},
        comp,
    )
    bag_header = record(
        {b"op": b"\x03", b"index_pos": struct.pack("<Q", 0),
         b"conn_count": struct.pack("<I", 1),
         b"chunk_count": struct.pack("<I", 1)},
        b" " * 128,
    )
    with open(path, "wb") as f:
        f.write(b"#ROSBAG V2.0\n")
        f.write(bag_header)
        f.write(chunk_rec)


def _camera_info_msg(width, height, fx, fy, cx, cy, d=()):
    """Serialize sensor_msgs/CameraInfo (fields decode_camera_info reads)."""
    out = struct.pack("<I", 0) + struct.pack("<II", 0, 0)  # header
    out += struct.pack("<I", 0)  # frame_id ""
    out += struct.pack("<II", height, width)
    model = b"plumb_bob"
    out += struct.pack("<I", len(model)) + model
    d = np.asarray(d, np.float64)
    out += struct.pack("<I", len(d)) + d.tobytes()
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    out += K.tobytes()
    out += np.eye(3).tobytes()
    P = np.zeros((3, 4))
    P[:3, :3] = K
    out += P.tobytes()
    out += struct.pack("<II", 0, 0) + struct.pack("<IIII", 0, 0, 0, 0) + b"\x00"
    return out


def _event_array_msg(xs, ys, ts, ps, width=240, height=180):
    out = struct.pack("<I", 0) + struct.pack("<II", 0, 0)  # header seq + stamp
    out += struct.pack("<I", 0)  # frame_id ""
    out += struct.pack("<II", height, width)
    out += struct.pack("<I", len(xs))
    for x, y, t, p in zip(xs, ys, ts, ps):
        sec = int(t)
        nsec = int(round((t - sec) * 1e9))
        out += struct.pack("<HHII", x, y, sec, nsec) + struct.pack("B", 1 if p > 0 else 0)
    return out


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_rosbag_event_roundtrip(tmp_path, compression):
    p = str(tmp_path / f"test_{compression}.bag")
    msg1 = _event_array_msg([1, 2], [3, 4], [0.5, 0.6], [1, -1])
    msg2 = _event_array_msg([7], [8], [0.7], [1])
    _write_test_bag(p, [msg1, msg2], compression)
    xs, ys, ts, ps = rosbag.read_rosbag_events(p)
    np.testing.assert_array_equal(xs, [1, 2, 7])
    np.testing.assert_array_equal(ys, [3, 4, 8])
    np.testing.assert_allclose(ts, [0.5, 0.6, 0.7], atol=1e-9)
    np.testing.assert_array_equal(ps, [1, -1, 1])
    bag = rosbag.BagReader(p)
    assert bag.topics() == {"/dvs/events": "dvs_msgs/EventArray"}


def test_png_writer_roundtrip(tmp_path):
    img = (np.arange(64 * 32).reshape(32, 64) % 256).astype(np.uint8)
    p = str(tmp_path / "test.png")
    image.write_png(p, img)
    with open(p, "rb") as f:
        data = f.read()
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    assert b"IHDR" in data and b"IEND" in data


def test_render_pano_range():
    img = np.random.default_rng(0).uniform(0, 7, (16, 32))
    out = image.render_pano(img, gamma=0.75)
    assert out.dtype == np.uint8
    assert out.min() == 0 and out.max() == 255  # inverted full range


def test_rotation_rms():
    from cmax_slam_tpu import spline

    times = np.linspace(0, 1, 20)
    omega = np.array([0.3, -0.2, 0.5])
    q_ref = np.stack([spline._np_quat_exp(omega * t) for t in times])
    # identical up to a global gauge rotation
    g = spline._np_quat_exp(np.array([0.2, 0.7, -0.1]))
    q_est = np.stack([spline._np_quat_mul(g, q) for q in q_ref])
    rms, errs = evaluate.rotation_rms_deg(times, q_ref, q_est, "global")
    assert rms < 1e-5
    rms_f, _ = evaluate.rotation_rms_deg(times, q_ref, q_est, "first")
    assert rms_f < 1e-5


def test_tum_io(tmp_path):
    from cmax_slam_tpu import spline

    traj = spline.Trajectory(0.0, 0.1, order=2)
    qs = np.stack([spline._np_quat_exp(np.array([0.1, 0, 0]) * i) for i in range(5)])
    traj.push_ctrl_poses(qs)
    p = str(tmp_path / "traj.txt")
    evaluate.write_tum_trajectory(p, traj, dt_sample=0.05)
    times, quats = evaluate.read_tum_trajectory(p)
    assert len(times) >= 5
    np.testing.assert_allclose(np.linalg.norm(quats, axis=1), 1.0, atol=1e-6)


def test_rosbag_camera_info_roundtrip(tmp_path):
    p = str(tmp_path / "cam.bag")
    _write_test_bag(
        p, [(0, _camera_info_msg(240, 180, 190.0, 191.0, 120.5, 90.5,
                                 d=[-0.3, 0.1, 0, 0, 0]))],
        conns=[("/dvs/camera_info", "sensor_msgs/CameraInfo")],
    )
    calib = rosbag.read_rosbag_camera_info(p)
    assert (calib.width, calib.height) == (240, 180)
    np.testing.assert_allclose(calib.K[0, 0], 190.0)
    np.testing.assert_allclose(calib.K[1, 2], 90.5)
    np.testing.assert_allclose(calib.D[0], -0.3)


def test_load_events_zip(tmp_path):
    import zipfile

    txt = tmp_path / "events.txt"
    with open(txt, "w") as f:
        for i in range(50):
            f.write(f"{i*0.001:.6f} {i%20} {i%15} {i%2}\n")
    zp = str(tmp_path / "events.zip")
    with zipfile.ZipFile(zp, "w") as z:
        z.write(txt, "events.txt")
    xs, ys, ts, ps = ev_io.load_events(zp, max_events=30)
    assert len(xs) == 30
    np.testing.assert_allclose(ts[:3], [0.0, 0.001, 0.002])
    assert set(np.unique(ps)) <= {-1, 1}
