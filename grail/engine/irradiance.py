"""Irradiance caching — pbrt src/integrators/irradiancecache.cpp, wavefront-
reshaped.

pbrt builds the cache lazily: on a shade-point cache miss it fires a
cosine-weighted hemispherical gather, stores (E, harmonic-mean distance,
normal) in an octree, and interpolates when the Ward error metric admits
nearby entries. Lazy insertion is hostile to SPMD, so the TPU design is
two-phase: (1) preprocess — seed cache entries from a coarse camera-pixel
grid (every scene point a camera sees is reachable this way), gathering
irradiance for all entries in one vectorized pass; (2) shading — every pixel
interpolates over the whole entry table with pbrt's weight
w_i = 1 / (|p-p_i|/maxDist_i + sqrt(1 - n.n_i)), masked by w_i > 1/maxError,
as a dense masked contraction (the octree is replaced by FLOPs)."""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core.vecmath import dot, normalize
from ..kernels import intersect as isect
from ..shade import lights as lt
from ..shade import geometry as geom

_DIM = 8000


def _gather_radiance(scene, meta, p, n_normal, eps, pix, samp, dim):
    """Radiance arriving along one cosine-sampled gather ray: emitted + direct
    at the hit (the depth-1 path pbrt's cache gather effectively evaluates)."""
    from .integrator import _shade_context, estimate_direct, _pick_light, IntegratorConfig
    u1, u2 = rngmod.sample_2d(meta.sampler, pix, samp, dim)
    wl = mc.cosine_sample_hemisphere(u1, u2)
    sgf = {"ns": n_normal}
    # build a frame around the normal
    from ..core.vecmath import coordinate_system
    t1, t2 = coordinate_system(n_normal)
    w = wl[..., 0:1] * t1 + wl[..., 1:2] * t2 + wl[..., 2:3] * n_normal
    n = p.shape[0]
    hit = isect.intersect(scene, p + w * eps[..., None], w,
                          jnp.full((n,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, wo_local = _shade_context(scene, meta, hit, p, w)
    L = jnp.zeros((n, 3), jnp.float32)
    if lt.AREA in meta.light_types:
        L += lt.area_light_emitted(scene, sg, -w)
    if meta.n_lights > 0:
        cfg1 = IntegratorConfig(kind="direct", max_depth=1)
        lidx, pmf = _pick_light(scene, meta, cfg1, pix, samp, 0, active)
        L += estimate_direct(
            scene, meta, sg, lobes, wo_local, lidx, pmf,
            rngmod.sample_2d(meta.sampler, pix, samp, dim + 1),
            rngmod.sample_1d(meta.sampler, pix, samp, dim + 3),
            rngmod.sample_1d(meta.sampler, pix, samp, dim + 4),
            rngmod.sample_2d(meta.sampler, pix, samp, dim + 5),
            active)
    L = jnp.where(active[..., None], L, lt.escaped_radiance(
        scene, w, meta.light_types))
    dist = jnp.where(active, hit["t"], 1.0e7)
    return L, dist


def irradiance_preprocess(scene, meta, cfg):
    """Seed + gather the cache: coarse camera-pixel grid -> hit points ->
    vectorized hemispherical gathers -> (p, n, E, maxDist) entry table."""
    from . import camera as cam

    gx, gy, gz = cfg.ic_grid
    n_entries = gx * gy    # camera-seeded: a 2D pixel grid (gz unused here)
    xs = ((jnp.arange(gx) + 0.5) / gx * meta.xres).astype(jnp.int32)
    ys = ((jnp.arange(gy) + 0.5) / gy * meta.yres).astype(jnp.int32)
    px, py = [a.reshape(-1) for a in jnp.meshgrid(xs, ys, indexing="ij")]
    pixid = (py * meta.xres + px).astype(jnp.uint32)
    samp = jnp.zeros((n_entries,), jnp.uint32)
    half = jnp.full((n_entries,), 0.5, jnp.float32)
    rays = cam.generate_rays(scene["camera"], px, py, half, half, half, half,
                             half * 0.0, meta.cam_kind)

    def build(scene):
        hit = isect.intersect(scene, rays["o"], rays["d"],
                              jnp.full((n_entries,), 1.0e7, jnp.float32))
        valid = hit["prim"] >= 0
        sg = geom.shading_geometry(scene, hit, rays["o"], rays["d"])
        nrm = jnp.where(dot(sg["ns"], -rays["d"])[..., None] < 0.0,
                        -sg["ns"], sg["ns"])
        p, eps = sg["p"], sg["ray_eps"]
        E = jnp.zeros((n_entries, 3), jnp.float32)
        inv_d = jnp.zeros((n_entries,), jnp.float32)
        ns = cfg.ic_nsamples
        for s in range(ns):
            L, dist = _gather_radiance(scene, meta, p, nrm, eps, pixid, samp,
                                       _DIM + 8 * s)
            # cosine-sampled: E += pi * L / ns
            E = E + (math.pi / ns) * L
            inv_d = inv_d + 1.0 / jnp.maximum(dist, 1e-4)
        max_dist = ns / jnp.maximum(inv_d, 1e-9)   # harmonic mean distance
        return {"p": p, "n": nrm, "E": E,
                "max_dist": jnp.clip(max_dist, 1e-3, 1e6),
                "valid": valid}

    return jax.jit(build)(scene)


def _interpolate(aux, p, n_normal, max_error):
    """pbrt IrradianceCache::interpolateE weight + cutoff, dense over the
    entry table."""
    perr = jnp.linalg.norm(p[:, None, :] - aux["p"][None], axis=-1) \
        / aux["max_dist"][None]                                 # (N,P)
    nerr = jnp.sqrt(jnp.maximum(
        (1.0 - jnp.einsum("nc,pc->np", n_normal, aux["n"],
                          precision="highest")) / (1.0 - math.cos(0.1745)),
        0.0))
    err = jnp.maximum(perr, 1e-6) + nerr
    w = jnp.where(aux["valid"][None] & (err < 1.0 / max_error),
                  1.0 / err, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    # fallback: nearest valid entry when the metric admits none
    nearest = jnp.argmin(jnp.where(aux["valid"][None], perr, jnp.inf), axis=1)
    E_near = aux["E"][nearest]
    E = jnp.einsum("np,pc->nc", w, aux["E"], precision="highest") \
        / jnp.maximum(wsum, 1e-12)
    return jnp.where(wsum > 0.0, E, E_near)


def irradiancecache_li(scene, meta, cfg, rays, pix, samp, aux):
    """IrradianceCacheIntegrator::Li: direct lighting + rho/pi * interpolated
    cached irradiance; escaped rays see the environment."""
    from .integrator import (_shade_context, estimate_direct, _pick_light)
    from .prt import _diffuse_albedo
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    hit = isect.intersect(scene, o, d, jnp.full((n,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, wo_local = _shade_context(scene, meta, hit, o, d)

    nf = jnp.where(dot(sg["ns"], -d)[..., None] < 0.0, -sg["ns"], sg["ns"])
    E = _interpolate(aux, sg["p"], nf, cfg.ic_maxerror)
    rho = _diffuse_albedo(lobes)
    L = rho / math.pi * E

    if lt.AREA in meta.light_types:
        L += lt.area_light_emitted(scene, sg, -d)
    if meta.n_lights > 0:
        lidx, pmf = _pick_light(scene, meta, cfg, pix, samp, 0, active)
        L += estimate_direct(
            scene, meta, sg, lobes, wo_local, lidx, pmf,
            rngmod.sample_2d(meta.sampler, pix, samp, _DIM + 7000),
            rngmod.sample_1d(meta.sampler, pix, samp, _DIM + 7002),
            rngmod.sample_1d(meta.sampler, pix, samp, _DIM + 7003),
            rngmod.sample_2d(meta.sampler, pix, samp, _DIM + 7004),
            active)

    Lesc = lt.escaped_radiance(scene, d, meta.light_types)
    L = jnp.where(active[..., None], L, Lesc)
    return L * rays["weight"][..., None]
