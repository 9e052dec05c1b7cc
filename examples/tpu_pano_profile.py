"""Per-stage timing of the back-end pano objective on TPU (chained)."""
import os, sys, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

from cmax_slam_tpu import spline, lie
from cmax_slam_tpu.calib import EquirectCamera
from cmax_slam_tpu.io import synthetic
from cmax_slam_tpu.ops import warp_pano
from cmax_slam_tpu.ops.warp_pano import PanoWindow
from cmax_slam_tpu.ops.blur import gaussian_blur
from cmax_slam_tpu.ops.scatter import bilinear_accumulate_two

W, H = 240, 180
FX = FY = 180.0
Hp, Wp = 512, 1024
N = 25600
BATCH = 100
K = 5
rng = np.random.default_rng(0)
omega = np.array([0.7, -1.1, 1.6])
ev = synthetic.rotating_camera_events(
    rng, N, 0.2, omega, FX, FY, W / 2, H / 2, W, H, n_points=300
)
lut = synthetic.identity_lut(W, H, FX, FY, W / 2, H / 2)
bear = np.ascontiguousarray(lut[ev.ys * W + ev.xs].T)
dtk = 0.05
knots = np.stack([spline._np_quat_exp(omega * (i * dtk)) for i in range(K)])
B = N // BATCH
tsb = ev.ts.reshape(B, BATCH)
mid = 0.5 * (tsb[:, 0] + tsb[:, -1])
pano = EquirectCamera(width=Wp, height=Hp)
win = PanoWindow(
    bearings=jnp.asarray(bear), batch_times=jnp.asarray(mid, jnp.float32),
    weights=jnp.ones(N, jnp.float32), is_old=jnp.asarray(ev.ts < 0.1),
    knots=jnp.asarray(knots, jnp.float32), free_mask=jnp.ones(K, jnp.float32),
    t0=jnp.float32(0.0), dt_knots=jnp.float32(dtk),
    ig_prime=jnp.zeros((Hp, Wp), jnp.float32), alpha=jnp.float32(0.0),
)
f, vg = warp_pano.make_pano_objective(win, pano, 2, 1.0, 0)
d0 = jnp.zeros(3 * K, jnp.float32)

px0, py0 = jax.jit(lambda d: warp_pano.warp_to_pano(d.reshape(K, 3), win, pano, 2))(d0)

def timeit(name, step, reps=16):
    @functools.partial(jax.jit, static_argnums=0)
    def chain(k):
        c, _ = jax.lax.scan(step, 0.0, jnp.arange(k, dtype=jnp.float32))
        return c
    jax.block_until_ready(chain(reps))
    t0 = time.perf_counter(); jax.block_until_ready(chain(reps))
    dt = (time.perf_counter() - t0) / reps
    print(f"{name}: {dt*1e3:.2f} ms/eval")

def s_warp(c, i):
    px, py = warp_pano.warp_to_pano((d0 + c * 1e-12 + i * 1e-9).reshape(K, 3), win, pano, 2)
    return jnp.sum(px) * 1e-12, None

def s_votes(c, i):
    o, n_ = bilinear_accumulate_two(px0 + c * 1e-12 + i * 1e-9, py0, win.weights,
                                    ~win.is_old, height=Hp, width=Wp)
    return jnp.mean(o + n_), None

def s_blur(c, i):
    img = gaussian_blur(win.ig_prime + c * 1e-12 + i * 1e-9 + 1.0, 1.0, "highest")
    return jnp.mean(img), None

def s_f(c, i):
    return f(d0 + c * 1e-12 + i * 1e-9), None

def s_vg(c, i):
    v, g = vg(d0 + c * 1e-12 + i * 1e-9)
    return v + jnp.sum(g) * 1e-12, None

timeit("warp(spline+rot+proj)", s_warp)
timeit("votes(two)           ", s_votes)
timeit("blur 512x1024 highest", s_blur)
timeit("f (full objective)   ", s_f)
timeit("value_and_grad       ", s_vg, reps=8)

# ---- FOV-crop objective at the same window ----------------------------------
from cmax_slam_tpu.ops.blur import opencv_ksize

bbox = np.asarray(warp_pano.warp_bbox(jnp.zeros((K, 3), jnp.float32), win, pano, 2))
h = opencv_ksize(1.0) // 2
pad = max(32.0, 0.1 * pano.fx) + 2 * h + 2
ladder = (128, 256, 384, 512, 768, 1024)
Hc = min([b for b in ladder if b >= bbox[3] - bbox[2] + 2 * pad] or [Hp], key=int)
Wc = min([b for b in ladder if b >= bbox[1] - bbox[0] + 2 * pad] or [Wp], key=int)
x0 = min(max(int(0.5 * (bbox[0] + bbox[1]) - Wc / 2), 0), Wp - Wc)
y0 = min(max(int(0.5 * (bbox[2] + bbox[3]) - Hc / 2), 0), Hp - Hc)
ints = jnp.asarray(np.array(
    [y0, x0, h if y0 else 0, Hc - h, h if x0 else 0, Wc - h], np.int32))
print(f"crop: {Hc}x{Wc} at ({y0},{x0})")
win_c, x0f, y0f, a_crop, mask, o1, o2 = jax.jit(
    lambda w, ci: warp_pano.crop_window_constants(w, pano, 2, 1.0, 0, (Hc, Wc), ci)
)(win, ints)
fc, vgc = warp_pano.make_crop_objective(
    win_c, pano, 2, 1.0, 0, (Hc, Wc), x0f, y0f, a_crop, mask, o1, o2)

def s_fc(c, i):
    return fc(d0 + c * 1e-12 + i * 1e-9), None

def s_vgc(c, i):
    v, g = vgc(d0 + c * 1e-12 + i * 1e-9)
    return v + jnp.sum(g) * 1e-12, None

def s_votes_crop(c, i):
    il = warp_pano._accumulate_image(px0 - x0f + c * 1e-12 + i * 1e-9,
                                     py0 - y0f, win.weights, Hc, Wc, "highest")
    return jnp.mean(il), None

timeit("crop votes (pallas)  ", s_votes_crop)
timeit("crop f               ", s_fc)
timeit("crop value_and_grad  ", s_vgc, reps=8)
