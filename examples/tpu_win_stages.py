"""Bisect the fixed (non-CG) cost of one window solve into stages."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from cmax_slam_tpu.calib import CameraCalibration
from cmax_slam_tpu.config import ijrr_config, replace as cfg_replace
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.system import CMaxSLAM
from cmax_slam_tpu.ops import warp_pano
from cmax_slam_tpu import spline
import cmax_slam_tpu.backend as backend_mod

W, H = 240, 180
FX = FY = 180.0
RATE = 390_000
DURATION = 1.2
CHUNK = RATE // 10
rng = np.random.default_rng(11)
omega_true = np.array([0.9, -1.3, 1.9])
n = int(RATE * DURATION)
ev = synthetic.rotating_camera_events(
    rng, n, DURATION, omega_true, FX, FY, W / 2, H / 2, W, H, n_points=400)
calib = CameraCalibration(width=W, height=H,
    K=np.array([[FX, 0, W / 2], [0, FY, H / 2], [0, 0, 1.0]]))
cfg = ijrr_config()
PRECISION = os.environ.get("RT_PRECISION", "default")
cfg = cfg_replace(cfg, **{"frontend.warp.precision": PRECISION,
                          "backend.warp.precision": PRECISION})

records = []
orig_dispatch = backend_mod.Backend._dispatch_window_solve_impl

def patched(self, xs, ys, ts, idx_cp, nf):
    p = orig_dispatch(self, xs, ys, ts, idx_cp, nf)
    records.append(dict(plan=p["plan"], size=p["size"], K=p["K"],
                        args=p["args"], backend=self))
    return p

backend_mod.Backend._dispatch_window_solve_impl = patched

slam = CMaxSLAM(calib, cfg)
for i in range(0, n, CHUNK):
    slam.push_events(ev.xs[i:i + CHUNK], ev.ys[i:i + CHUNK],
                     ev.ts[i:i + CHUNK], ev.pols[i:i + CHUNK])
slam.flush()

r = records[-1]
be = r["backend"]
Hc, Wc, ints, h = r["plan"]
K = r["K"]
print(f"window: crop {Hc}x{Wc}, size={r['size']}, K={K}", flush=True)
(evd, smalls, ig_prime, update_times) = r["args"]
(batch_times, knots, free_mask, fov_times, _ci, _lam, t0a, dtk) = (
    backend_mod._unpack_smalls(jnp.asarray(smalls), K, be._fov_count))
crop_ints = jnp.asarray(ints)
lut_dev = be.lut_dev
pano, order, sigma, measure = be.pano, be.order, be.cfg.warp.blur_sigma, be.cfg.contrast_measure
prec = be.cfg.warp.precision


def timeit(label, fn, *args, reps=6):
    out = fn(*args); jax.block_until_ready(out)
    t = 1e9
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(fn(*args))
        t = min(t, time.perf_counter() - t0)
    print(f"{label}: {t*1e3:.2f} ms", flush=True)
    return out


@jax.jit
def stage_unpack(evd, bt, kn, fm, t0, dk, igp, lut):
    win = backend_mod._unpack_window(evd, bt, kn, fm, t0, dk, igp, lut, be.cam_width)
    return win.bearings.sum()

@jax.jit
def stage_constants(evd, bt, kn, fm, t0, dk, igp, lut, ci):
    win0 = backend_mod._unpack_window(evd, bt, kn, fm, t0, dk, igp, lut, be.cam_width)
    win, x0f, y0f, a_crop, mask, o1, o2 = warp_pano.crop_window_constants(
        win0, pano, order, sigma, measure, (Hc, Wc), ci, prec)
    return a_crop.sum() + o1 + o2 + win.alpha

@jax.jit
def stage_vg(evd, bt, kn, fm, t0, dk, igp, lut, ci):
    win0 = backend_mod._unpack_window(evd, bt, kn, fm, t0, dk, igp, lut, be.cam_width)
    win, x0f, y0f, a_crop, mask, o1, o2 = warp_pano.crop_window_constants(
        win0, pano, order, sigma, measure, (Hc, Wc), ci, prec)
    f, vg = warp_pano.make_crop_objective(
        win, pano, order, sigma, measure, (Hc, Wc), x0f, y0f, a_crop, mask,
        o1, o2, prec)
    v, g = vg(jnp.zeros(3 * K, jnp.float32))
    return v + g.sum()

@jax.jit
def stage_epilogue(evd, bt, kn, fm, t0, dk, igp, upd, fovt, lut, ci):
    win0 = backend_mod._unpack_window(evd, bt, kn, fm, t0, dk, igp, lut, be.cam_width)
    drotv = jnp.zeros((K, 3), jnp.float32)
    knots_new = spline.apply_masked_increments(kn, drotv, fm)
    px, py = warp_pano.warp_to_pano(drotv, win0, pano, order)
    valid = win0.weights > 0
    inf = jnp.asarray(jnp.inf, px.dtype)
    bbox = jnp.stack([jnp.min(jnp.where(valid, px, inf)),
                      jnp.max(jnp.where(valid, px, -inf)),
                      jnp.min(jnp.where(valid, py, inf)),
                      jnp.max(jnp.where(valid, py, -inf))])
    from cmax_slam_tpu.ops.scatter import bilinear_accumulate_two
    x0f = ci[1].astype(jnp.float32); y0f = ci[0].astype(jnp.float32)
    ilo_c, _ = bilinear_accumulate_two(px - x0f, py - y0f, win0.weights,
                                       ~win0.is_old, height=Hc, width=Wc)
    il_old = jax.lax.dynamic_update_slice(
        jnp.zeros(igp.shape, jnp.float32), ilo_c, (ci[0], ci[1]))
    ig_new, upd_new = backend_mod._map_epilogue(
        igp, upd, il_old, knots_new, fovt, t0, dk, pano, order, lut,
        be.cfg.pano_map.max_update_times)
    return ig_new.sum() + upd_new.sum() + bbox.sum()

@jax.jit
def stage_fov(kn, fovt, t0, dk, lut):
    q_fov = spline.evaluate(kn, fovt, t0, dk, order)
    fovm = warp_pano.fov_mask(q_fov, lut, pano, radius=3)
    return fovm.sum()

@jax.jit
def stage_split_two(evd, bt, kn, fm, t0, dk, igp, lut, ci):
    win0 = backend_mod._unpack_window(evd, bt, kn, fm, t0, dk, igp, lut, be.cam_width)
    px, py = warp_pano.warp_to_pano(jnp.zeros((K, 3), jnp.float32), win0, pano, order)
    from cmax_slam_tpu.ops.scatter import bilinear_accumulate_two
    x0f = ci[1].astype(jnp.float32); y0f = ci[0].astype(jnp.float32)
    ilo, iln = bilinear_accumulate_two(px - x0f, py - y0f, win0.weights,
                                       ~win0.is_old, height=Hc, width=Wc)
    return ilo.sum() + iln.sum()


timeit("unpack (LUT gather)      ", stage_unpack, evd, batch_times, knots, free_mask, t0a, dtk, ig_prime, lut_dev)
timeit("unpack+crop constants    ", stage_constants, evd, batch_times, knots, free_mask, t0a, dtk, ig_prime, lut_dev, crop_ints)
timeit("constants + 1 vg eval    ", stage_vg, evd, batch_times, knots, free_mask, t0a, dtk, ig_prime, lut_dev, crop_ints)
timeit("epilogue (split+maps+fov)", stage_epilogue, evd, batch_times, knots, free_mask, t0a, dtk, ig_prime, update_times, fov_times, lut_dev, crop_ints)
timeit("fov mask alone           ", stage_fov, knots, fov_times, t0a, dtk, lut_dev)
timeit("warp+split votes alone   ", stage_split_two, evd, batch_times, knots, free_mask, t0a, dtk, ig_prime, lut_dev, crop_ints)

# --- control experiments: is the 25 ms environmental or data-dependent? ------
@jax.jit
def trivial(evd):
    return evd.sum()

timeit("trivial sum on captured evd", trivial, evd)
evd_fresh = jnp.asarray(np.asarray(evd))
timeit("trivial sum on fresh evd   ", trivial, evd_fresh)

fresh_args = [jnp.asarray(np.asarray(a)) for a in
              (evd, batch_times, knots, free_mask, t0a, dtk, ig_prime)]
fresh_lut = jnp.asarray(np.asarray(lut_dev))
timeit("unpack on FRESH copies     ", stage_unpack, *fresh_args, fresh_lut)
