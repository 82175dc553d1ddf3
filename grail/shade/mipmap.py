"""MIPMap — pbrt src/core/mipmap.h (Lanczos pow2 resample, pyramid build,
trilinear Lookup(s,t,width), EWA Lookup(s,t,ds,dt)) as batched jnp.

Divergences (documented):
- The pyramid is a host-side NumPy precompute (scene build), stored as one
  jnp array per level; levels are selected per shade point with masked
  bilinear lookups over the *static* level list (no data-dependent shapes).
- pbrt's EWA loops over a data-dependent ellipse extent; here the ellipse is
  sampled with a fixed 4x4 tap grid over its bounding box with Gaussian
  weights (static shapes, same weightLut falloff) — anisotropy is captured,
  extreme eccentricities are clamped by `maxaniso` exactly like the
  reference.
- Wrap mode: repeat (pbrt's default); clamp/black variants at the caller.
"""
from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp


def lanczos(x, tau=2.0):
    x = np.abs(x)
    s = np.where(x < 1e-6, 1.0, np.sin(math.pi * x) / (math.pi * x))
    l = np.where(x < 1e-6, 1.0,
                 np.sin(math.pi * x / tau) / (math.pi * x / tau))
    return np.where(x >= tau, 0.0, s * l)


def _resample_weights(old_n, new_n, tau=2.0):
    """pbrt MIPMap::resampleWeights: 4-tap Lanczos weights per new texel."""
    origin = (np.arange(new_n) + 0.5) * old_n / new_n
    first = np.floor(origin - tau + 0.5).astype(np.int64)
    offs = first[:, None] + np.arange(4)[None, :]
    w = lanczos((offs + 0.5 - origin[:, None]) / tau)
    w = w / np.maximum(w.sum(1, keepdims=True), 1e-9)
    return np.clip(offs, 0, old_n - 1), w


def _next_pow2(n):
    return 1 << max(0, (n - 1).bit_length())


def build_pyramid(img):
    """(H,W,3) float image → list of levels [finest..1x1], pow2 resampled."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    ph, pw = _next_pow2(h), _next_pow2(w)
    if (ph, pw) != (h, w):
        idx, wt = _resample_weights(w, pw)
        img = (img[:, idx] * wt[None, :, :, None]).sum(2)
        idx, wt = _resample_weights(h, ph)
        img = (img[idx] * wt[:, :, None, None]).sum(1)
    levels = [img.astype(np.float32)]
    while levels[-1].shape[0] > 1 or levels[-1].shape[1] > 1:
        cur = levels[-1]
        h, w = cur.shape[:2]
        # a dimension that already reached 1 stays 1 (non-square pyramids
        # end 1xN / Nx1 before 1x1, like MIPMap's pow2 levels)
        fh, fw = (2 if h > 1 else 1), (2 if w > 1 else 1)
        nh, nw = h // fh, w // fw
        cur = cur[: nh * fh, : nw * fw]
        levels.append(cur.reshape(nh, fh, nw, fw, -1).mean((1, 3)))
    return levels


def pack_pyramid(levels):
    """Device representation: all levels flattened into ONE (S,C) array with
    per-level offsets/sizes. Level selection becomes index arithmetic + flat
    1-D gathers — no masked loop over levels (which evaluated EVERY level for
    every lane) and no 2-D advanced-index gathers (the pathologically slow
    XLA:TPU gather path; measured ~1 s per 1M-lane texture pass before)."""
    flat = jnp.asarray(np.concatenate(
        [np.asarray(l, np.float32).reshape(-1, l.shape[-1]) for l in levels]))
    hs = np.asarray([l.shape[0] for l in levels], np.int32)
    ws = np.asarray([l.shape[1] for l in levels], np.int32)
    offs = np.concatenate([[0], np.cumsum(hs.astype(np.int64)
                                          * ws)[:-1]]).astype(np.int32)
    return {"flat": flat, "h": jnp.asarray(hs), "w": jnp.asarray(ws),
            "off": jnp.asarray(offs), "n_levels": len(levels)}


def _bilinear_level(pyr, l_idx, s, t):
    """Repeat-wrapped bilinear fetch at per-lane integer level l_idx."""
    h = pyr["h"][l_idx]
    w = pyr["w"][l_idx]
    off = pyr["off"][l_idx]
    x = s * w.astype(jnp.float32) - 0.5
    y = t * h.astype(jnp.float32) - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    x0m = jnp.mod(x0, w)
    x1m = jnp.mod(x0 + 1, w)
    y0m = jnp.mod(y0, h)
    y1m = jnp.mod(y0 + 1, h)
    flat = pyr["flat"]
    c00 = flat[off + y0m * w + x0m]
    c01 = flat[off + y0m * w + x1m]
    c10 = flat[off + y1m * w + x0m]
    c11 = flat[off + y1m * w + x1m]
    return ((1 - fy) * ((1 - fx) * c00 + fx * c01)
            + fy * ((1 - fx) * c10 + fx * c11))


def lookup_trilinear(pyr, s, t, width):
    """MIPMap::Lookup(s,t,width): level = nLevels-1 + log2(max(width,eps)),
    lerp between the two bracketing levels (8 flat gathers total)."""
    n_levels = pyr["n_levels"]
    s = jnp.mod(s, 1.0)
    t = jnp.mod(t, 1.0)
    lvl = (n_levels - 1) + jnp.log2(jnp.maximum(width, 1e-8))
    lvl = jnp.clip(lvl, 0.0, n_levels - 1)
    l0 = jnp.floor(lvl)
    frac = (lvl - l0)[..., None]
    i0 = l0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, n_levels - 1)
    out0 = _bilinear_level(pyr, i0 * jnp.ones_like(s, jnp.int32), s, t)
    out1 = _bilinear_level(pyr, i1 * jnp.ones_like(s, jnp.int32), s, t)
    return (1.0 - frac) * out0 + frac * out1


_EWA_TAPS = 4      # fixed 4x4 tap grid over the ellipse bounding box


def lookup_ewa(pyr, s, t, ds0, dt0, ds1, dt1, maxaniso=8.0):
    """MIPMap::Lookup(s,t,ds0,dt0,ds1,dt1) — EWA with a static tap grid.

    The level is chosen from the minor axis (after maxaniso clamping), the
    elliptical Gaussian is evaluated on a fixed 4x4 grid spanning the
    ellipse's bounding box, weights normalized (pbrt weightLut falloff
    alpha=2)."""
    n_levels = pyr["n_levels"]
    # major/minor axis lengths
    len0 = jnp.sqrt(ds0 * ds0 + dt0 * dt0)
    len1 = jnp.sqrt(ds1 * ds1 + dt1 * dt1)
    major = jnp.maximum(len0, len1)
    minor = jnp.minimum(len0, len1)
    # clamp eccentricity (mipmap.h: if minor*maxaniso < major, scale minor)
    scale = jnp.where(minor * maxaniso < major,
                      major / jnp.maximum(minor * maxaniso, 1e-12), 1.0)
    minor = minor * scale
    lvl = (n_levels - 1) + jnp.log2(jnp.maximum(minor, 1e-8))
    lvl = jnp.clip(lvl, 0.0, n_levels - 1)
    l0 = jnp.floor(lvl)

    # ellipse implicit coefficients (mipmap.h EWA)
    A = dt0 * dt0 + dt1 * dt1 + 1e-10
    B = -2.0 * (ds0 * dt0 + ds1 * dt1)
    C = ds0 * ds0 + ds1 * ds1 + 1e-10
    invF = 1.0 / (A * C - B * B * 0.25)
    A_, B_, C_ = A * invF, B * invF, C * invF
    # bounding box half-extents (mipmap.h: sqrt ellipse extents)
    det = -B_ * B_ + 4.0 * A_ * C_
    u_r = jnp.sqrt(jnp.maximum(C_ * 4.0 / jnp.maximum(det, 1e-12), 0.0))
    v_r = jnp.sqrt(jnp.maximum(A_ * 4.0 / jnp.maximum(det, 1e-12), 0.0))
    u_r = jnp.minimum(u_r, 0.5)
    v_r = jnp.minimum(v_r, 0.5)

    taps = (jnp.arange(_EWA_TAPS) + 0.5) / _EWA_TAPS * 2.0 - 1.0   # (-1,1)
    acc = None
    wsum = None
    for iu in range(_EWA_TAPS):
        for iv in range(_EWA_TAPS):
            du = taps[iu] * u_r
            dv = taps[iv] * v_r
            r2 = A_ * du * du + B_ * du * dv + C_ * dv * dv
            w = jnp.where(r2 < 1.0, jnp.exp(-2.0 * r2) - math.exp(-2.0), 0.0)
            li = l0.astype(jnp.int32)
            val = _bilinear_level(pyr, li, jnp.mod(s + du, 1.0),
                                  jnp.mod(t + dv, 1.0))
            w = jnp.maximum(w, 0.0)[..., None]
            acc = val * w if acc is None else acc + val * w
            wsum = w if wsum is None else wsum + w
    fallback = lookup_trilinear(pyr, s, t, 2.0 ** (lvl - (n_levels - 1)))
    return jnp.where(wsum > 1e-8, acc / jnp.maximum(wsum, 1e-8), fallback)
