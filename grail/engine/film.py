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


def _shift2d(a, dy, dx):
    """out[y, x] = a[y-dy, x-dx], zero outside (static dy/dx)."""
    h, w = a.shape[0], a.shape[1]
    a = jnp.pad(a, ((max(dy, 0), max(-dy, 0)),
                    (max(dx, 0), max(-dx, 0))) + ((0, 0),) * (a.ndim - 2))
    return a[max(-dy, 0):max(-dy, 0) + h, max(-dx, 0):max(-dx, 0) + w]


TILE_H, TILE_W = 8, 16   # ray-order pixel tile = one 128-ray BVH sub-packet


def tiled_order(meta_or_shape):
    """True when waves use the tiled pixel order (see lane_pixel).

    Lanes traverse the image in 8x16 pixel tiles so that each 128-lane BVH
    sub-packet (kernels/bvh_stream.py) sees a compact square-ish footprint
    instead of a raster row strip — measured 2x fewer traversal steps. Only
    for resolutions that tile exactly; others keep raster order."""
    if hasattr(meta_or_shape, "xres"):
        xres, yres = meta_or_shape.xres, meta_or_shape.yres
    else:
        yres, xres = meta_or_shape
    return xres % TILE_W == 0 and yres % TILE_H == 0


def lane_pixel(lane, xres):
    """Tiled lane -> (px, py): lane i sits in tile i//128, offset i%128."""
    tiles_x = xres // TILE_W
    tile = lane // (TILE_H * TILE_W)
    within = lane % (TILE_H * TILE_W)
    ty = tile // tiles_x
    tx = tile % tiles_x
    py = ty * TILE_H + within // TILE_W
    px = tx * TILE_W + within % TILE_W
    return px.astype(jnp.int32), py.astype(jnp.int32)


def _untile(x, yres, xres):
    """Lane-ordered (H*W, ...) in tile order -> image-ordered (H, W, ...)."""
    th, tw = TILE_H, TILE_W
    rest = x.shape[1:]
    x = x.reshape(yres // th, xres // tw, th, tw, *rest)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(yres, xres, *rest)


def add_samples_grid(film, fcfg: flt.FilterConfig, sx, sy, L, chunk,
                     weight=None, tiled=False):
    """AddSample for full-grid waves: lane i carries pixel i % (H*W), tiled
    `chunk` times (sample-major); lane->pixel mapping is raster order or the
    8x16 tile order (tiled=True, see lane_pixel). Semantically equal to
    add_samples but with no scatter: each static tap offset around the lane's
    own pixel becomes a reshape-reduce over the chunk axis plus a shifted
    dense add. (XLA:TPU serializes scatter-with-collisions — measured 271 ms
    for one 1M-lane box-filter scatter vs <1 ms for this path.)"""
    yres, xres = film["weight"].shape
    dimx = sx - 0.5
    dimy = sy - 0.5
    px = jnp.floor(sx)        # lane's own pixel (sx = px + u, u in [0,1))
    py = jnp.floor(sy)
    rx = int(math.floor(fcfg.xwidth + 0.5))
    ry = int(math.floor(fcfg.ywidth + 0.5))
    if weight is None:
        weight = jnp.ones(sx.shape, jnp.float32)

    def to_image(x):
        if tiled:
            return _untile(x, yres, xres)
        return x.reshape(yres, xres, *x.shape[1:])

    rgb = film["rgb"]
    wsum = film["weight"]
    # accumulate wave-by-wave in sample order so the film is BITWISE
    # independent of the chunk decomposition (checkpoint/resume, SURVEY §5.4)
    for c in range(chunk):
        sl = slice(c * yres * xres, (c + 1) * yres * xres)
        for dy in range(-ry, ry + 1):
            for dx in range(-rx, rx + 1):
                w = flt.evaluate(fcfg, px[sl] + dx - dimx[sl],
                                 py[sl] + dy - dimy[sl]) * weight[sl]
                wl = to_image(w[..., None] * L[sl])
                ws = to_image(w)
                rgb = rgb + _shift2d(wl, dy, dx)
                wsum = wsum + _shift2d(ws, dy, dx)
    return {"rgb": rgb, "weight": wsum, "splat": film["splat"]}


def add_samples_band(film, fcfg: flt.FilterConfig, sx, sy, L, y0, margin,
                     weight=None, tiled=False):
    # y0 is accepted for signature clarity but unused: lane->band-row mapping
    # is positional; sx/sy arrive in global raster coords for filter weights.
    """Dense AddSample for a device-local horizontal film band (the sharded
    render's fast path — SURVEY §2.7 TPU equiv: tile-local accumulation, one
    cross-chip reduce at develop).

    film: {"rgb": (R+2*margin, W, 3), "weight": (R+2*margin, W), ...} — a
    band of R pixel rows plus `margin` filter-spill rows on each side. Lanes
    are the band's full pixel grid (R*W, raster or 8x16-tile order); sx, sy
    are GLOBAL raster sample coords; y0 is the band's first global row
    (traced — each device passes its own offset). Filter taps landing up to
    `margin` rows outside the band accumulate into the spill rows; devices
    place overlapping bands into the padded global film and psum, so spill
    adds exactly once. Requires floor(ywidth + 0.5) <= margin."""
    rows = film["weight"].shape[0] - 2 * margin
    xres = film["weight"].shape[1]
    dimx = sx - 0.5
    dimy = sy - 0.5
    px = jnp.floor(sx)
    py = jnp.floor(sy)
    rx = int(math.floor(fcfg.xwidth + 0.5))
    ry = int(math.floor(fcfg.ywidth + 0.5))
    assert ry <= margin, "filter y-extent exceeds band margin"
    if weight is None:
        weight = jnp.ones(sx.shape, jnp.float32)

    def to_band(x):
        if tiled:
            return _untile(x, rows, xres)
        return x.reshape(rows, xres, *x.shape[1:])

    def pad_rows(x):
        return jnp.pad(x, ((margin, margin),) + ((0, 0),) * (x.ndim - 1))

    rgb = film["rgb"]
    wsum = film["weight"]
    for dy in range(-ry, ry + 1):
        for dx in range(-rx, rx + 1):
            w = flt.evaluate(fcfg, px + dx - dimx, py + dy - dimy) * weight
            wl = pad_rows(to_band(w[..., None] * L))
            ws = pad_rows(to_band(w))
            rgb = rgb + _shift2d(wl, dy, dx)
            wsum = wsum + _shift2d(ws, dy, dx)
    del y0  # sx/sy arrive global, but lane->band-row mapping is positional
    return {"rgb": rgb, "weight": wsum, "splat": film["splat"]}


def new_band_film(rows, xres, margin):
    return {
        "rgb": jnp.zeros((rows + 2 * margin, xres, 3), jnp.float32),
        "weight": jnp.zeros((rows + 2 * margin, xres), jnp.float32),
        "splat": jnp.zeros((rows + 2 * margin, xres, 3), jnp.float32),
    }


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
