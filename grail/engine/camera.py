"""Camera ray generation — pbrt src/cameras/{perspective,orthographic,environment}
+ src/core/camera.{h,cpp} as a single vectorized raygen kernel.

A camera is a dict in the scene pytree: type tag, raster→camera matrix, animated
camera→world pack, lens radius / focal distance (depth of field via concentric disk
sampling, perspective.cpp ~L60), shutter open/close (motion blur: per-ray time lerp,
then slerp of the camera transform).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.vecmath import normalize, lerp
from ..core import transform as tr
from ..core import montecarlo as mc

PERSPECTIVE = 0
ORTHOGRAPHIC = 1
ENVIRONMENT = 2


def build_camera(cam_type, cam2world_start, cam2world_end, xres, yres, fov=90.0,
                 screen_window=None, lens_radius=0.0, focal_distance=1e6,
                 shutter_open=0.0, shutter_close=1.0, znear=1e-2, zfar=1000.0):
    """Host-side camera pack (api.cpp MakeCamera analog)."""
    aspect = xres / yres
    if screen_window is None:
        if aspect > 1.0:
            screen_window = [-aspect, aspect, -1.0, 1.0]
        else:
            screen_window = [-1.0, 1.0, -1.0 / aspect, 1.0 / aspect]
    x0, x1, y0, y1 = screen_window
    # screen→raster: scale/translate chain as pbrt ProjectiveCamera ctor
    screen2raster = (
        tr.scale(xres, yres, 1.0)
        @ tr.scale(1.0 / (x1 - x0), 1.0 / (y0 - y1), 1.0)
        @ tr.translate([-x0, -y1, 0.0])
    )
    if cam_type == PERSPECTIVE:
        cam2screen = tr.perspective(fov, znear, zfar)
    elif cam_type == ORTHOGRAPHIC:
        cam2screen = tr.orthographic(znear, zfar)
    else:
        cam2screen = tr.identity()
    raster2cam = tr.inverse(screen2raster @ cam2screen)
    return {
        "type": np.int32(cam_type),
        "raster2cam": raster2cam,
        "c2w": tr.animated_pack(cam2world_start, cam2world_end),
        "lens_radius": np.float32(lens_radius),
        "focal_distance": np.float32(focal_distance),
        "shutter": np.array([shutter_open, shutter_close], np.float32),
    }


def generate_rays(camera, px, py, u_film_x, u_film_y, u_lens_1, u_lens_2, u_time,
                  cam_kind):
    """Raster samples → world rays. cam_kind is the static camera type.

    px,py integer pixel coords (N,); u_* in [0,1). Returns dict o, d, time, weight.
    """
    raster = jnp.stack([px.astype(jnp.float32) + u_film_x,
                        py.astype(jnp.float32) + u_film_y,
                        jnp.zeros_like(u_film_x)], axis=-1)
    r2c = camera["raster2cam"]
    pcam = tr.xform_p(r2c, raster)

    if cam_kind == PERSPECTIVE:
        o = jnp.zeros_like(pcam)
        d = normalize(pcam)
    elif cam_kind == ORTHOGRAPHIC:
        o = pcam
        d = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32), pcam.shape)
    elif cam_kind == ENVIRONMENT:
        # lat-long over the full sphere (environment.cpp GenerateRay)
        nx = raster[..., 0] / jnp.float32(1.0)  # raster already in pixels
        # theta/phi from NDC: caller passes px in [0,xres), py in [0,yres)
        theta = jnp.pi * (py.astype(jnp.float32) + u_film_y) / camera["yres"]
        phi = 2.0 * jnp.pi * (px.astype(jnp.float32) + u_film_x) / camera["xres"]
        d = jnp.stack([jnp.sin(theta) * jnp.cos(phi), jnp.cos(theta),
                       jnp.sin(theta) * jnp.sin(phi)], axis=-1)
        o = jnp.zeros_like(d)
    else:
        raise ValueError(f"unknown camera kind {cam_kind}")

    # depth of field (perspective.cpp GenerateRay DOF block)
    lens_r = camera["lens_radius"]
    if cam_kind in (PERSPECTIVE, ORTHOGRAPHIC):
        lx, ly = mc.concentric_sample_disk(u_lens_1, u_lens_2)
        lx = lx * lens_r
        ly = ly * lens_r
        dz = jnp.where(jnp.abs(d[..., 2]) > 1e-9, d[..., 2], 1.0)
        ft = camera["focal_distance"] / dz
        pfocus = o + ft[..., None] * d
        o_dof = jnp.stack([o[..., 0] + lx, o[..., 1] + ly, o[..., 2]], axis=-1)
        d_dof = normalize(pfocus - o_dof)
        use_dof = lens_r > 0.0
        o = jnp.where(use_dof, o_dof, o)
        d = jnp.where(use_dof, d_dof, d)

    time = lerp(u_time, camera["shutter"][0], camera["shutter"][1])
    o_w = tr.animated_apply(camera["c2w"], time, o, is_point=True)
    d_w = normalize(tr.animated_apply(camera["c2w"], time, d, is_point=False))
    return {"o": o_w, "d": d_w, "time": time,
            "weight": jnp.ones(px.shape, jnp.float32)}
