"""Texture engine — pbrt src/core/texture.{h,cpp} + src/textures/* as a static DAG.

pbrt resolves Texture<T> virtual calls per evaluation; here the scene's texture table
is a STATIC list (textures must be declared before use in .pbrt, so the table is
already in topological order) and evaluation is an unrolled pass computing every
row's value at every shade point into (NT, N, 3). Differentiable parameters (const
colors, scale/mix amounts via nested const textures, image texels) live in the scene
pytree; structure (kinds, input wiring, mappings) is static so XLA sees straight-line
code.

Kinds: const, scale, mix, bilerp, uv, checkerboard (2D/3D), dots, fbm, wrinkled,
windy, marble, image (bilinear now; trilinear mip in imagemap Lookup path).
Mappings: uv / spherical / cylindrical / planar / 3D-identity (texture.h classes).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.vecmath import PI, INV_PI, INV_TWOPI, normalize, dot, spherical_theta, spherical_phi
from ..core import transform as tr


@dataclasses.dataclass(frozen=True)
class TexSpec:
    """Static description of one texture table row (host side, hashable)."""
    kind: str
    inputs: Tuple[int, ...] = ()      # indices of input textures (already defined)
    mapping: str = "uv"               # uv | spherical | cylindrical | planar | 3d
    su: float = 1.0
    sv: float = 1.0
    du: float = 0.0
    dv: float = 0.0
    v1: Tuple[float, float, float] = (1.0, 0.0, 0.0)   # planar mapping axes
    v2: Tuple[float, float, float] = (0.0, 1.0, 0.0)
    octaves: int = 8
    omega: float = 0.5
    aa: str = "closedform"            # checkerboard antialias mode (none|closedform)
    dim: int = 2                      # checkerboard dimension
    image_id: int = -1                # index into scene["images"] list for kind=image
    # dots params etc. ride in su/sv; marble uses omega/octaves + scale/variation:
    scale: float = 1.0
    variation: float = 0.2
    gamma: bool = False
    filt: str = "ewa"                 # imagemap filtering: bilinear|trilinear|ewa
    maxaniso: float = 8.0             # EWA eccentricity clamp ("maxanisotropy")


# ------------------------------------------------------------------------ Perlin noise
# pbrt texture.cpp NoisePerm table (Ken Perlin's permutation), doubled.
_PERM = np.array([
    151, 160, 137, 91, 90, 15, 131, 13, 201, 95, 96, 53, 194, 233, 7, 225, 140, 36,
    103, 30, 69, 142, 8, 99, 37, 240, 21, 10, 23, 190, 6, 148, 247, 120, 234, 75, 0,
    26, 197, 62, 94, 252, 219, 203, 117, 35, 11, 32, 57, 177, 33, 88, 237, 149, 56,
    87, 174, 20, 125, 136, 171, 168, 68, 175, 74, 165, 71, 134, 139, 48, 27, 166,
    77, 146, 158, 231, 83, 111, 229, 122, 60, 211, 133, 230, 220, 105, 92, 41, 55,
    46, 245, 40, 244, 102, 143, 54, 65, 25, 63, 161, 1, 216, 80, 73, 209, 76, 132,
    187, 208, 89, 18, 169, 200, 196, 135, 130, 116, 188, 159, 86, 164, 100, 109,
    198, 173, 186, 3, 64, 52, 217, 226, 250, 124, 123, 5, 202, 38, 147, 118, 126,
    255, 82, 85, 212, 207, 206, 59, 227, 47, 16, 58, 17, 182, 189, 28, 42, 223, 183,
    170, 213, 119, 248, 152, 2, 44, 154, 163, 70, 221, 153, 101, 155, 167, 43, 172,
    9, 129, 22, 39, 253, 19, 98, 108, 110, 79, 113, 224, 232, 178, 185, 112, 104,
    218, 246, 97, 228, 251, 34, 242, 193, 238, 210, 144, 12, 191, 179, 162, 241, 81,
    51, 145, 235, 249, 14, 239, 107, 49, 192, 214, 31, 181, 199, 106, 157, 184, 84,
    204, 176, 115, 121, 50, 45, 127, 4, 150, 254, 138, 236, 205, 93, 222, 114, 67,
    29, 24, 72, 243, 141, 128, 195, 78, 66, 215, 61, 156, 180], dtype=np.int32)
NOISE_PERM = np.concatenate([_PERM, _PERM])


def _grad(x, y, z, dx, dy, dz):
    """pbrt texture.cpp Grad: hash low bits pick gradient from {±x±y, ±x±z, ±y±z}."""
    h = x & 15
    u = jnp.where(h < 8, dx, dy)
    v = jnp.where(h < 4, dy, jnp.where((h == 12) | (h == 14), dx, dz))
    u = jnp.where((h & 1) != 0, -u, u)
    v = jnp.where((h & 2) != 0, -v, v)
    return u + v
    del y, z


def _noise_weight(t):
    """pbrt NoiseWeight: 6t^5 - 15t^4 + 10t^3."""
    t3 = t * t * t
    t4 = t3 * t
    return 6.0 * t4 * t - 15.0 * t4 + 10.0 * t3


def noise(p):
    """Perlin noise at points p (...,3) — pbrt texture.cpp Noise(x,y,z) in [-1,1]."""
    perm = jnp.asarray(NOISE_PERM)
    pi = jnp.floor(p).astype(jnp.int32) & 255
    pf = p - jnp.floor(p)
    ix, iy, iz = pi[..., 0], pi[..., 1], pi[..., 2]
    dx, dy, dz = pf[..., 0], pf[..., 1], pf[..., 2]

    def g(ox, oy, oz):
        h = perm[perm[perm[ix + ox] + iy + oy] + iz + oz]
        return _grad(h, 0, 0, dx - ox, dy - oy, dz - oz)

    w000 = g(0, 0, 0); w100 = g(1, 0, 0); w010 = g(0, 1, 0); w110 = g(1, 1, 0)
    w001 = g(0, 0, 1); w101 = g(1, 0, 1); w011 = g(0, 1, 1); w111 = g(1, 1, 1)
    wx, wy, wz = _noise_weight(dx), _noise_weight(dy), _noise_weight(dz)
    x00 = w000 + wx * (w100 - w000)
    x10 = w010 + wx * (w110 - w010)
    x01 = w001 + wx * (w101 - w001)
    x11 = w011 + wx * (w111 - w011)
    y0 = x00 + wy * (x10 - x00)
    y1 = x01 + wy * (x11 - x01)
    return y0 + wz * (y1 - y0)


def fbm(p, omega, max_octaves, foreach_width=None):
    """Fractional Brownian motion (pbrt texture.cpp FBm), fixed octave count.

    The reference clamps octaves from ray differentials; until differentials land we
    evaluate all octaves (conservative, slightly more aliasing-prone)."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max_octaves):
        total = total + o * noise(lam * p)
        lam *= 1.99
        o *= omega
    return total


def turbulence(p, omega, max_octaves):
    """pbrt texture.cpp Turbulence: sum |noise|."""
    total = jnp.zeros(p.shape[:-1], jnp.float32)
    lam, o = 1.0, 1.0
    for _ in range(max_octaves):
        total = total + o * jnp.abs(noise(lam * p))
        lam *= 1.99
        o *= omega
    return total


def lanczos(x, tau=2.0):
    """Windowed sinc (pbrt texture.cpp Lanczos) — used by resampling & sinc filter."""
    x = jnp.abs(x)
    s = jnp.where(x < 1e-5, 1.0, jnp.sin(PI * x * tau) / (PI * x * tau))
    lanc = jnp.where(x < 1e-5, 1.0, jnp.sin(PI * x) / (PI * x))
    return jnp.where(x > 1.0, 0.0, s * lanc)


# ----------------------------------------------------------------------- tex mappings
def apply_mapping(spec: TexSpec, w2t, sg):
    """(s,t) texture coordinates for one spec (pbrt TextureMapping2D classes)."""
    if spec.mapping == "uv":
        s = spec.su * sg["uv"][..., 0] + spec.du
        t = spec.sv * sg["uv"][..., 1] + spec.dv
    elif spec.mapping == "spherical":
        pl = tr.xform_p(w2t, sg["p"])
        vec = normalize(pl)
        s = spherical_theta(vec) * INV_PI
        t = spherical_phi(vec) * INV_TWOPI
        s = spec.su * s + spec.du
        t = spec.sv * t + spec.dv
    elif spec.mapping == "cylindrical":
        pl = tr.xform_p(w2t, sg["p"])
        vec = normalize(pl)
        s = (PI + jnp.arctan2(vec[..., 1], vec[..., 0])) * INV_TWOPI
        t = vec[..., 2]
        s = spec.su * s + spec.du
        t = spec.sv * t + spec.dv
    elif spec.mapping == "planar":
        v1 = jnp.asarray(spec.v1, jnp.float32)
        v2 = jnp.asarray(spec.v2, jnp.float32)
        s = spec.du + dot(sg["p"], v1)
        t = spec.dv + dot(sg["p"], v2)
    else:
        raise ValueError(f"unknown 2d mapping {spec.mapping}")
    return s, t


def mapped_p3(w2t, sg):
    """3D identity mapping: world→texture point (pbrt IdentityMapping3D)."""
    return tr.xform_p(w2t, sg["p"])


# ------------------------------------------------------------------------ eval engine
def eval_textures(tex_specs, tex_data, sg, images=(), mipmaps=(), needed=None,
                  as_dict=False):
    """Evaluate the (topologically ordered) texture table at shade points.

    tex_specs: tuple[TexSpec] (static); tex_data: dict with
      const (NT,3) differentiable row params, w2t (NT,4,4) world→texture transforms.
    images: tuple of (H,W,3) jnp arrays for kind=image rows.
    needed: optional static set of row indices — only these rows (whose input
    closure the caller must include) are evaluated; others are skipped
    entirely. With as_dict=True returns {row: (N,3)} of evaluated rows (the
    material-sorted megabatch path, which wants no (NT,N,3) stack); otherwise
    returns values (NT, N, 3) with skipped rows as broadcast zeros. Float
    textures use channel 0 (stored replicated).
    """
    n = sg["p"].shape[0]
    vals = []

    def inp(i):
        return vals[i]

    for row, spec in enumerate(tex_specs):
        if needed is not None and row not in needed:
            vals.append(None)
            continue
        w2t = tex_data["w2t"][row]
        if spec.kind == "const":
            v = jnp.broadcast_to(tex_data["const"][row], (n, 3))
        elif spec.kind == "scale":
            v = inp(spec.inputs[0]) * inp(spec.inputs[1])
        elif spec.kind == "mix":
            amt = inp(spec.inputs[2])[..., :1]  # amount texture (float)
            v = (1.0 - amt) * inp(spec.inputs[0]) + amt * inp(spec.inputs[1])
        elif spec.kind == "bilerp":
            s, t = apply_mapping(spec, w2t, sg)
            v00, v01, v10, v11 = (inp(i) for i in spec.inputs)
            ss, tt = s[..., None], t[..., None]
            v = ((1 - ss) * (1 - tt) * v00 + (1 - ss) * tt * v01
                 + ss * (1 - tt) * v10 + ss * tt * v11)
        elif spec.kind == "uv":
            s, t = apply_mapping(spec, w2t, sg)
            v = jnp.stack([s - jnp.floor(s), t - jnp.floor(t),
                           jnp.zeros_like(s)], axis=-1)
        elif spec.kind == "checkerboard":
            if spec.dim == 2:
                s, t = apply_mapping(spec, w2t, sg)
                even = (jnp.floor(s) + jnp.floor(t)) % 2.0 == 0.0
            else:
                pl = mapped_p3(w2t, sg)
                even = (jnp.floor(pl[..., 0]) + jnp.floor(pl[..., 1])
                        + jnp.floor(pl[..., 2])) % 2.0 == 0.0
            v = jnp.where(even[..., None], inp(spec.inputs[0]), inp(spec.inputs[1]))
        elif spec.kind == "dots":
            s, t = apply_mapping(spec, w2t, sg)
            scell = jnp.floor(s + 0.5)
            tcell = jnp.floor(t + 0.5)
            # pbrt dots.h: per-cell hashed presence/center/radius via Noise
            has_dot = noise(jnp.stack([scell + 0.5, tcell + 0.5,
                                       jnp.zeros_like(s)], axis=-1)) > 0.0
            cs = scell + 0.35 * noise(jnp.stack([scell + 1.5, tcell + 2.8,
                                                 jnp.zeros_like(s)], axis=-1))
            ct = tcell + 0.35 * noise(jnp.stack([scell + 4.5, tcell + 9.8,
                                                 jnp.zeros_like(s)], axis=-1))
            inside = has_dot & (((s - cs) ** 2 + (t - ct) ** 2) < 0.35 * 0.35)
            v = jnp.where(inside[..., None], inp(spec.inputs[0]), inp(spec.inputs[1]))
        elif spec.kind == "fbm":
            pl = mapped_p3(w2t, sg)
            v = fbm(pl, spec.omega, spec.octaves)[..., None] * jnp.ones(3)
        elif spec.kind == "wrinkled":
            pl = mapped_p3(w2t, sg)
            v = turbulence(pl, spec.omega, spec.octaves)[..., None] * jnp.ones(3)
        elif spec.kind == "windy":
            pl = mapped_p3(w2t, sg)
            strength = fbm(0.1 * pl, 0.5, 3)
            height = fbm(pl, 0.5, 6)
            v = (jnp.abs(strength) * height)[..., None] * jnp.ones(3)
        elif spec.kind == "marble":
            pl = mapped_p3(w2t, sg) * spec.scale
            marble = pl[..., 1] + spec.variation * fbm(pl, spec.omega, spec.octaves)
            tt = 0.5 + 0.5 * jnp.sin(marble)
            v = _marble_spline(tt)
        elif spec.kind == "image":
            s, t = apply_mapping(spec, w2t, sg)
            v = image_lookup(spec, images, mipmaps, sg, s, t)
        else:
            raise ValueError(f"unknown texture kind {spec.kind}")
        vals.append(v)
    if as_dict:
        return {row: v for row, v in enumerate(vals) if v is not None}
    if needed is not None:
        z = jnp.zeros((n, 3), jnp.float32)
        vals = [z if v is None else v for v in vals]
    if not vals:
        return jnp.zeros((0, n, 3), jnp.float32)
    return jnp.stack(vals, axis=0)


# pbrt marble.h agate spline control colors
_MARBLE_C = np.array([
    [0.58, 0.58, 0.6], [0.58, 0.58, 0.6], [0.58, 0.58, 0.6],
    [0.5, 0.5, 0.5], [0.6, 0.59, 0.58], [0.58, 0.58, 0.6],
    [0.58, 0.58, 0.6], [0.2, 0.2, 0.33], [0.58, 0.58, 0.6]], dtype=np.float32)


def _marble_spline(t):
    """Evaluate pbrt marble's Bezier spline chain over control points at t in [0,1]."""
    c = jnp.asarray(_MARBLE_C)
    nseg = _MARBLE_C.shape[0] - 3
    tt = jnp.clip(t, 0.0, 0.9999) * nseg
    first = jnp.floor(tt).astype(jnp.int32)
    tloc = tt - first.astype(jnp.float32)
    c0 = c[first]
    c1 = c[first + 1]
    c2 = c[first + 2]
    c3 = c[first + 3]
    # cubic Bezier with these 4 points (pbrt marble.h Evaluate)
    s0 = (1 - tloc)[..., None]
    s1 = tloc[..., None]
    a0 = s0 * c0 + s1 * c1
    a1 = s0 * c1 + s1 * c2
    a2 = s0 * c2 + s1 * c3
    b0 = s0 * a0 + s1 * a1
    b1 = s0 * a1 + s1 * a2
    return 1.5 * (s0 * b0 + s1 * b1)


def image_lookup(spec, images, mipmaps, sg, s, t):
    """ImageTexture::Evaluate (imagemap.cpp): mapping -> (s,t,derivs) ->
    MIPMap::Lookup. Uses the mip pyramid + screen-space uv differentials when
    both are available (primary hits); falls back to finest-level bilinear
    (the width=0 path) otherwise."""
    from .mipmap import lookup_trilinear, lookup_ewa
    have_mips = mipmaps and 0 <= spec.image_id < len(mipmaps)
    duvdx = sg.get("duvdx")
    if (not have_mips) or duvdx is None or spec.filt == "bilinear":
        return image_bilinear(images[spec.image_id], s, t)
    pyr = mipmaps[spec.image_id]
    # derivatives of (s,t) through the uv mapping (UVMapping2D::Map computes
    # dstdx = (su*dudx, sv*dvdx); non-uv mappings fall back to width 0)
    if spec.mapping == "uv":
        ds0 = spec.su * duvdx[:, 0]
        dt0 = spec.sv * duvdx[:, 1]
        ds1 = spec.su * sg["duvdy"][:, 0]
        dt1 = spec.sv * sg["duvdy"][:, 1]
    else:
        ds0 = dt0 = ds1 = dt1 = jnp.zeros_like(s)
    if spec.filt == "trilinear":
        width = jnp.maximum(jnp.maximum(jnp.abs(ds0), jnp.abs(dt0)),
                            jnp.maximum(jnp.abs(ds1), jnp.abs(dt1)))
        return lookup_trilinear(pyr, s, t, 2.0 * width)
    return lookup_ewa(pyr, s, t, ds0, dt0, ds1, dt1, spec.maxaniso)


def image_bilinear(img, s, t):
    """Bilinear image lookup with repeat wrap (MIPMap trilinear comes with
    ray differentials; this is the width=0 path of MIPMap::Lookup)."""
    h, w = img.shape[0], img.shape[1]
    x = s * w - 0.5
    y = t * h - 0.5
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0.astype(jnp.float32)
    fy = y - y0.astype(jnp.float32)
    x0 = x0 % w
    x1 = (x0 + 1) % w
    y0 = y0 % h
    y1 = (y0 + 1) % h
    # flat 1-D gathers (2-D advanced indexing hits a pathologically slow
    # XLA:TPU gather path — measured ~1 s per 1M-lane texture pass)
    flat = img.reshape(-1, img.shape[-1])
    v00 = flat[y0 * w + x0]
    v01 = flat[y1 * w + x0]
    v10 = flat[y0 * w + x1]
    v11 = flat[y1 * w + x1]
    fx = fx[..., None]
    fy = fy[..., None]
    return ((1 - fx) * (1 - fy) * v00 + (1 - fx) * fy * v01
            + fx * (1 - fy) * v10 + fx * fy * v11)


def rows_closure(tex_specs, rows):
    """Transitive input closure of texture rows (host-side, static)."""
    needed = set()
    stack = [r for r in rows if r >= 0]
    while stack:
        r = stack.pop()
        if r in needed:
            continue
        needed.add(r)
        stack.extend(tex_specs[r].inputs)
    return frozenset(needed)


def eval_texture_rows(tex_specs, tex_data, sg, rows, images=()):
    """Evaluate only `rows` (+ their inputs); other rows become zeros.

    Returns (NT, N, 3) aligned with the full table (cheap: skipped rows are
    broadcast zeros that XLA folds away)."""
    needed = rows_closure(tex_specs, rows)
    n = sg["p"].shape[0]
    full = eval_textures(
        tuple(s if i in needed else TexSpec(kind="const")
              for i, s in enumerate(tex_specs)),
        tex_data, sg, images)
    return full
