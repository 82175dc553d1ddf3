"""Film — pbrt src/film/image.{h,cpp} ImageFilm, redesigned atomic-free.

The reference AtomicAdds filtered sample contributions into a shared pixel array
(AddSample ~L60). Here the film is a functional pytree {rgb_sum (H,W,3),
weight_sum (H,W), splat (H,W,3)}; each sample scatters into the static filter
footprint (ceil(2·width)² taps) with deterministic `.at[].add`, and cross-device
merging is a psum at image assembly (SURVEY §2.7 TPU equiv).
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from . import filters as flt
from ..core.spectrum import xyz_to_rgb, rgb_to_xyz


def new_film(xres, yres):
    return {
        "rgb": jnp.zeros((yres, xres, 3), jnp.float32),
        "weight": jnp.zeros((yres, xres), jnp.float32),
        "splat": jnp.zeros((yres, xres, 3), jnp.float32),
    }


def add_samples(film, fcfg: flt.FilterConfig, sx, sy, L, weight=None):
    """Accumulate filtered samples. sx,sy continuous raster coords (N,), L (N,3).

    Mirrors ImageFilm::AddSample: discrete pixels within the filter extent around
    (sx-0.5, sy-0.5) each get w=Evaluate(px-dx, py-dy)."""
    yres, xres = film["weight"].shape
    dimx = sx - 0.5
    dimy = sy - 0.5
    x0 = jnp.ceil(dimx - fcfg.xwidth).astype(jnp.int32)
    y0 = jnp.ceil(dimy - fcfg.ywidth).astype(jnp.int32)
    ntap_x = max(1, int(math.floor(2.0 * fcfg.xwidth)) + 1)
    ntap_y = max(1, int(math.floor(2.0 * fcfg.ywidth)) + 1)
    if weight is None:
        weight = jnp.ones(sx.shape, jnp.float32)

    rgb = film["rgb"]
    wsum = film["weight"]
    for j in range(ntap_y):
        for i in range(ntap_x):
            px = x0 + i
            py = y0 + j
            w = flt.evaluate(fcfg, px.astype(jnp.float32) - dimx,
                             py.astype(jnp.float32) - dimy) * weight
            inside = (px >= 0) & (px < xres) & (py >= 0) & (py < yres)
            w = jnp.where(inside, w, 0.0)
            pxc = jnp.clip(px, 0, xres - 1)
            pyc = jnp.clip(py, 0, yres - 1)
            rgb = rgb.at[pyc, pxc].add(w[..., None] * L)
            wsum = wsum.at[pyc, pxc].add(w)
    return {"rgb": rgb, "weight": wsum, "splat": film["splat"]}


def splat(film, sx, sy, L):
    """ImageFilm::Splat — unweighted scatter (Metropolis, light tracing)."""
    yres, xres = film["weight"].shape
    px = jnp.clip(sx.astype(jnp.int32), 0, xres - 1)
    py = jnp.clip(sy.astype(jnp.int32), 0, yres - 1)
    inside = (sx >= 0) & (sx < xres) & (sy >= 0) & (sy < yres)
    L = jnp.where(inside[..., None], L, 0.0)
    return {"rgb": film["rgb"], "weight": film["weight"],
            "splat": film["splat"].at[py, px].add(L)}


def develop(film, splat_scale=1.0):
    """ImageFilm::WriteImage math: rgb/weight + splatScale·splat, clamp negatives."""
    w = jnp.maximum(film["weight"], 1e-9)[..., None]
    img = film["rgb"] / w + splat_scale * film["splat"]
    return jnp.maximum(img, 0.0)


def merge(films):
    """Sum partial films (cross-chip/host reduce analog of P2)."""
    out = films[0]
    for f in films[1:]:
        out = {k: out[k] + f[k] for k in out}
    return out
