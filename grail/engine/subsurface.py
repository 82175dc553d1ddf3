"""Dipole BSSRDF subsurface scattering — pbrt src/integrators/
dipolesubsurface.cpp + src/renderers/surfacepoints.cpp, wavefront-reshaped.

pbrt pipeline: Poisson-disk surface points (random-walk repulsion) -> per-point
irradiance tasks -> octree (SubsurfaceOctreeNode) with hierarchical Mo
evaluation under a solid-angle error cutoff. TPU reshape: area-weighted uniform
triangle sampling for the point set (no repulsion walk; density is corrected by
per-point area weights), irradiance at all points in one vectorized direct-
lighting pass, and Mo as a dense (pixels x points) Rd contraction — the
hierarchy is replaced by raw FLOPs, which is the idiomatic trade on a TPU
(P ~ 1-4k points keeps the contraction tiny next to path tracing).

Dipole diffusion Rd and the Fresnel moments follow dipolesubsurface.cpp
(Jensen et al. 2001).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core.vecmath import cross, dot, normalize, absdot
from ..kernels import intersect as isect
from ..shade import lights as lt
from ..shade import bsdf as bx

_DIM = 7000


def fresnel_diffuse_reflectance(eta):
    """Fdr(eta) — pbrt FresnelDiffuseReflectance (dipolesubsurface.cpp)."""
    if eta >= 1.0:
        return -1.4399 / (eta * eta) + 0.7099 / eta + 0.6681 + 0.0636 * eta
    return (-0.4399 + 0.7099 / eta - 0.3319 / (eta * eta)
            + 0.0636 / (eta * eta * eta))


def rd_integral(alphap, A):
    """Total diffuse albedo of the dipole for reduced albedo alphap — pbrt
    volume.cpp RdIntegral."""
    import numpy as np
    s = np.sqrt(3.0 * (1.0 - alphap))
    return alphap / 2.0 * (1.0 + np.exp(-4.0 / 3.0 * A * s)) * np.exp(-s)


def subsurface_from_diffuse(kd, meanfreepath, eta):
    """Invert the dipole albedo: diffuse reflectance Kd + mean free path →
    (sigma_a, sigma_prime_s) — pbrt volume.cpp SubsurfaceFromDiffuse /
    RdToAlphap (bisection per channel), used by kdsubsurface.cpp. Host-side.
    """
    import numpy as np
    kd = np.asarray(kd, np.float64)
    fdr = fresnel_diffuse_reflectance(eta)
    A = (1.0 + fdr) / (1.0 - fdr)
    lo = np.zeros_like(kd)
    hi = np.ones_like(kd)
    for _ in range(32):
        mid = 0.5 * (lo + hi)
        below = rd_integral(mid, A) < kd
        lo = np.where(below, mid, lo)
        hi = np.where(below, hi, mid)
    alphap = 0.5 * (lo + hi)
    sigma_tr = 1.0 / max(float(meanfreepath), 1e-9)
    sigmap_t = sigma_tr / np.sqrt(3.0 * np.maximum(1.0 - alphap, 1e-9))
    sigmap_s = alphap * sigmap_t
    sigma_a = sigmap_t - sigmap_s
    return (tuple(float(x) for x in sigma_a),
            tuple(float(x) for x in sigmap_s))


def dipole_rd(d2, sigma_a, sigma_prime_s, eta):
    """Jensen dipole diffusion profile Rd(d^2), per channel.

    d2 (...,1) squared distance; sigma_* (3,). Mirrors
    DipoleSubsurfaceIntegrator's Rd (dipolesubsurface.cpp)."""
    sigmap_t = sigma_a + sigma_prime_s
    alphap = sigma_prime_s / jnp.maximum(sigmap_t, 1e-9)
    sigma_tr = jnp.sqrt(3.0 * sigma_a * sigmap_t)
    fdr = fresnel_diffuse_reflectance(eta)
    A = (1.0 + fdr) / (1.0 - fdr)
    zr = 1.0 / jnp.maximum(sigmap_t, 1e-9)
    zv = zr * (1.0 + 4.0 / 3.0 * A)
    dr = jnp.sqrt(d2 + zr * zr)
    dv = jnp.sqrt(d2 + zv * zv)
    return (alphap / (4.0 * math.pi)
            * (zr * (sigma_tr * dr + 1.0) * jnp.exp(-sigma_tr * dr) / (dr ** 3)
               + zv * (sigma_tr * dv + 1.0) * jnp.exp(-sigma_tr * dv) / (dv ** 3)))


def sample_surface_points(scene, n_points, seed=0):
    """surfacepoints.cpp analog: p_i, n_i and the area each point represents.

    Area-weighted uniform triangle sampling (Distribution1D over triangle
    areas + uniform barycentrics) instead of pbrt's Poisson repulsion walk —
    uniform-in-area by construction, so each point stands for A_total/P."""
    import numpy as np
    verts = np.asarray(scene["verts"])
    tris = np.asarray(scene["tri_idx"])
    v0 = verts[tris[:, 0]]
    e1 = verts[tris[:, 1]] - v0
    e2 = verts[tris[:, 2]] - v0
    cr = np.cross(e1, e2)
    areas = 0.5 * np.linalg.norm(cr, axis=1)
    total = float(areas.sum())
    cdf = np.cumsum(areas) / max(total, 1e-20)
    rng = np.random.default_rng(seed)
    u = rng.random(n_points)
    ti = np.searchsorted(cdf, u)
    ti = np.minimum(ti, len(areas) - 1)
    u1 = np.sqrt(rng.random(n_points))
    u2 = rng.random(n_points)
    b0 = 1.0 - u1
    b1 = u1 * (1.0 - u2)
    p = (b0[:, None] * v0[ti] + (b1)[:, None] * (v0[ti] + e1[ti])
         + (1.0 - b0 - b1)[:, None] * (v0[ti] + e2[ti]))
    n = cr[ti] / np.maximum(np.linalg.norm(cr[ti], axis=1, keepdims=True), 1e-20)
    area = np.full(n_points, total / n_points, np.float32)
    return (jnp.asarray(p, jnp.float32), jnp.asarray(n, jnp.float32),
            jnp.asarray(area))


def _irradiance_at_points(scene, meta, p, n, n_samples=4):
    """Direct-lighting irradiance E at each surface point (the
    IrradiancePointTask analog in dipolesubsurface.cpp Preprocess)."""
    npts = p.shape[0]
    pix = jnp.arange(npts, dtype=jnp.uint32)
    samp = jnp.zeros((npts,), jnp.uint32)
    eps = jnp.full((npts,), 1e-3, jnp.float32)
    E = jnp.zeros((npts, 3), jnp.float32)
    for lrow in range(meta.n_lights):
        lidx = jnp.full((npts,), lrow, jnp.int32)
        for s in range(n_samples):
            d0 = _DIM + (lrow * n_samples + s) * 3
            u1, u2 = rngmod.sample_2d(meta.sampler, pix, samp, d0)
            u3 = rngmod.sample_1d(meta.sampler, pix, samp, d0 + 2)
            ls = lt.sample_li(scene, lidx, p, u1, u2, u3, meta.light_types,
                              meta.light_image_rows)
            cosw = dot(ls["wi"], n)
            ok = (ls["pdf"] > 0.0) & (cosw > 0.0)
            occ = isect.intersect_p(scene, p + ls["wi"] * eps[..., None],
                                    ls["wi"],
                                    jnp.where(ok, ls["dist"] - 2e-3, 0.0))
            w = jnp.where(ok & ~occ,
                          cosw / (jnp.maximum(ls["pdf"], 1e-12) * n_samples),
                          0.0)
            E = E + ls["radiance"] * w[..., None]
    return E


def dipole_preprocess(scene, meta, cfg):
    """Sample the point cloud and bake per-point irradiance."""
    p, n, area = sample_surface_points(scene, cfg.sss_npoints)
    E = jax.jit(_irradiance_at_points, static_argnums=(1,))(scene, meta, p, n)
    return {"p": p, "n": n, "area": area, "E": E}


def dipole_li(scene, meta, cfg, rays, pix, samp, aux):
    """DipoleSubsurfaceIntegrator::Li: Mo(p) = sum_i Rd(|p-p_i|^2) E_i A_i,
    Lo = (Ft/(pi*Fdt)) * Mo  (dipolesubsurface.cpp), plus direct lighting."""
    from .integrator import _shade_context, estimate_direct, _pick_light, li as path_li
    o, d = rays["o"], rays["d"]
    n_rays = o.shape[0]
    hit = isect.intersect(scene, o, d, jnp.full((n_rays,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, wo_local = _shade_context(scene, meta, hit, o, d)

    sigma_a = jnp.asarray(cfg.sss_sigma_a, jnp.float32)
    sigma_ps = jnp.asarray(cfg.sss_sigma_s, jnp.float32)
    eta = float(cfg.sss_eta)

    # Mo: dense pixels x points contraction (chunked over points to bound
    # the (N,P,3) intermediate)
    p = sg["p"]
    Mo = jnp.zeros((n_rays, 3), jnp.float32)
    P = aux["p"].shape[0]
    chunk = 512
    for s in range(0, P, chunk):
        pp = aux["p"][s:s + chunk]                       # (C,3)
        EE = aux["E"][s:s + chunk]
        AA = aux["area"][s:s + chunk]
        d2 = jnp.sum((p[:, None, :] - pp[None, :, :]) ** 2, axis=-1)
        rd = dipole_rd(d2[..., None], sigma_a, sigma_ps, eta)   # (N,C,3)
        Mo = Mo + jnp.sum(rd * (EE * AA[:, None])[None], axis=1)

    # Fresnel transmittance terms (pbrt: Ft(eta, wo) / (pi * (1 - 2*Fdr/...)))
    cos_o = jnp.abs(bx.cos_theta(wo_local))
    Ft = 1.0 - bx.fr_dielectric(cos_o, jnp.float32(1.0), jnp.float32(eta))
    fdt = 1.0 - fresnel_diffuse_reflectance(eta)
    L_sss = (Ft / math.pi)[..., None] * fdt * Mo

    # + direct lighting at the surface (dipolesubsurface.cpp adds MIS direct)
    Ld = jnp.zeros((n_rays, 3), jnp.float32)
    if meta.n_lights > 0:
        lidx, pmf = _pick_light(scene, meta, cfg, pix, samp, 0, active)
        Ld = estimate_direct(
            scene, meta, sg, lobes, wo_local, lidx, pmf,
            rngmod.sample_2d(meta.sampler, pix, samp, _DIM + 900),
            rngmod.sample_1d(meta.sampler, pix, samp, _DIM + 902),
            rngmod.sample_1d(meta.sampler, pix, samp, _DIM + 903),
            rngmod.sample_2d(meta.sampler, pix, samp, _DIM + 904),
            active)

    Lesc = lt.escaped_radiance(scene, d, meta.light_types)
    L = jnp.where(active[..., None], L_sss + Ld, Lesc)
    return L * rays["weight"][..., None]
