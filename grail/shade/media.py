"""Participating media — pbrt src/core/volume.{h,cpp} + src/volumes/* +
src/integrators/{emission,single}.cpp as SoA region tables.

Region types: HOMOGENEOUS (constant σa/σs in a box — closed-form tau and
emission), GRID (trilinear density grid × base σ, volumegrid.cpp), EXPONENTIAL
(a·e^(−b·h) along `updir`, exponential.cpp). Phase: Henyey-Greenstein per region
(pbrt PhaseHG). Region kinds are static (SceneMeta.media_kinds) so homogeneous
scenes compile with NO marching loops at all; heterogeneous regions march with
lax.fori_loop (MAX_MARCH_STEPS lanes, jittered — emission.cpp's stepsize walk).

sample_distance() implements homogeneous distance sampling with spectral channel
selection — the BASELINE config-5 upgrade over pbrt's fixed-step marching.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from ..core.vecmath import dot, lerp
from ..core import transform as tr
from ..core import montecarlo as mc

HOMOGENEOUS = 0
GRID = 1
EXPONENTIAL = 2

MAX_MARCH_STEPS = 32

# GetVolumeScatteringProperties (pbrt src/core/volume.cpp measured-media
# table, Jensen et al. 2001 "A Practical Model for Subsurface Light
# Transport"): name -> (sigma_a, sigma_prime_s) in mm^-1.
MEASURED_MEDIA = {
    "Apple": ((0.0030, 0.0034, 0.046), (2.29, 2.39, 1.97)),
    "Chicken1": ((0.015, 0.077, 0.19), (0.15, 0.21, 0.38)),
    "Chicken2": ((0.018, 0.088, 0.20), (0.19, 0.25, 0.32)),
    "Cream": ((0.0002, 0.0028, 0.0163), (7.38, 5.47, 3.15)),
    "Ketchup": ((0.061, 0.97, 1.45), (0.18, 0.07, 0.03)),
    "Marble": ((0.0021, 0.0041, 0.0071), (2.19, 2.62, 3.00)),
    "Potato": ((0.0024, 0.0090, 0.12), (0.68, 0.70, 0.55)),
    "Skimmilk": ((0.0014, 0.0025, 0.0142), (0.70, 1.22, 1.90)),
    "Skin1": ((0.032, 0.17, 0.48), (0.74, 0.88, 1.01)),
    "Skin2": ((0.013, 0.070, 0.145), (1.09, 1.59, 1.79)),
    "Spectralon": ((0.00001, 0.00001, 0.00001), (11.6, 20.4, 14.9)),
    "Wholemilk": ((0.0011, 0.0024, 0.014), (2.55, 3.21, 3.77)),
}


def region_segment(media, r, o, d, tmax):
    """Ray overlap [t0, t1] with static region r's bounds (volume-space box)."""
    w2v = media["w2v"][r]
    ov = tr.xform_p(w2v, o)
    dv = tr.xform_v(w2v, d)
    bmin = media["bounds_min"][r]
    bmax = media["bounds_max"][r]
    inv = 1.0 / jnp.where(jnp.abs(dv) < 1e-12,
                          jnp.where(dv < 0, -1e-12, 1e-12), dv)
    ta = (bmin - ov) * inv
    tb = (bmax - ov) * inv
    t0 = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=-1), 0.0)
    t1 = jnp.minimum(jnp.min(jnp.maximum(ta, tb), axis=-1), tmax)
    return t0, t1, t0 < t1


def density_at(media, grids, r, kind, p_world):
    """Density multiplier at world points for static region r of static kind."""
    w2v = media["w2v"][r]
    pv = tr.xform_p(w2v, p_world)
    bmin = media["bounds_min"][r]
    bmax = media["bounds_max"][r]
    inside = jnp.all((pv >= bmin) & (pv <= bmax), axis=-1)
    if kind == HOMOGENEOUS:
        return inside.astype(jnp.float32)
    if kind == EXPONENTIAL:
        h = dot(pv - bmin, media["updir"][r])
        return jnp.where(
            inside, media["exp_a"][r] * jnp.exp(-media["exp_b"][r] * h), 0.0)
    # GRID: trilinear (volumegrid.cpp VolumeGridDensity::Density)
    val = jnp.zeros(p_world.shape[:-1], jnp.float32)
    for gid, grid in enumerate(grids):
        nz, ny, nx = grid.shape
        u = (pv - bmin) / jnp.maximum(bmax - bmin, 1e-12)
        x = u[..., 0] * nx - 0.5
        y = u[..., 1] * ny - 0.5
        z = u[..., 2] * nz - 0.5
        x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, nx - 1)
        y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, ny - 1)
        z0 = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, nz - 1)
        x1 = jnp.minimum(x0 + 1, nx - 1)
        y1 = jnp.minimum(y0 + 1, ny - 1)
        z1 = jnp.minimum(z0 + 1, nz - 1)
        fx = jnp.clip(x - x0, 0.0, 1.0)
        fy = jnp.clip(y - y0, 0.0, 1.0)
        fz = jnp.clip(z - z0, 0.0, 1.0)
        c = lambda zi, yi, xi: grid[zi, yi, xi]
        d00 = lerp(fx, c(z0, y0, x0), c(z0, y0, x1))
        d10 = lerp(fx, c(z0, y1, x0), c(z0, y1, x1))
        d01 = lerp(fx, c(z1, y0, x0), c(z1, y0, x1))
        d11 = lerp(fx, c(z1, y1, x0), c(z1, y1, x1))
        g = lerp(fz, lerp(fy, d00, d10), lerp(fy, d01, d11))
        val = jnp.where(media["grid_id"][r] == gid, g, val)
    return jnp.where(inside, val, 0.0)


def _region_kinds(meta):
    return getattr(meta, "media_kinds", ())


def tau(scene, meta, o, d, tmax, u_jitter):
    """Optical thickness Σ_regions ∫σt (VolumeRegion::tau). Closed form for
    homogeneous regions; jittered fori-march otherwise."""
    kinds = _region_kinds(meta)
    media = scene.get("media")
    total = jnp.zeros(o.shape[:-1] + (3,), jnp.float32)
    if media is None or not kinds:
        return total
    grids = scene.get("density_grids", ())
    for r, kind in enumerate(kinds):
        t0, t1, hit = region_segment(media, r, o, d, tmax)
        seg = jnp.maximum(t1 - t0, 0.0)
        sig_t = media["sigma_a"][r] + media["sigma_s"][r]
        if kind == HOMOGENEOUS:
            contrib = seg[..., None] * sig_t
        else:
            dt = seg / MAX_MARCH_STEPS

            def body(s, acc):
                t = t0 + (s + u_jitter) * dt
                p = o + t[..., None] * d
                return acc + density_at(media, grids, r, kind, p) * dt

            accum = lax.fori_loop(0, MAX_MARCH_STEPS, body,
                                  jnp.zeros(o.shape[:-1], jnp.float32))
            contrib = accum[..., None] * sig_t
        total = total + jnp.where(hit[..., None], contrib, 0.0)
    return total


def transmittance(scene, meta, o, d, tmax, u_jitter):
    """exp(−tau) (EmissionIntegrator::Transmittance)."""
    if scene.get("media") is None or not _region_kinds(meta):
        return jnp.ones(o.shape[:-1] + (3,), jnp.float32)
    return jnp.exp(-tau(scene, meta, o, d, tmax, u_jitter))


def phase_hg_eval(g, cos_theta):
    return mc.hg_pdf(cos_theta, g)


# Phase function library — pbrt src/core/volume.cpp PhaseIsotropic/Rayleigh/
# MieHazy/MieMurky/Schlick. Volume regions use HG (as HomogeneousVolumeDensity
# does); these are the reference's free functions, normalized over the sphere.
INV_4PI = 1.0 / (4.0 * 3.14159265358979)


def phase_isotropic(cos_theta):
    return jnp.full(jnp.shape(cos_theta), INV_4PI, jnp.float32)


def phase_rayleigh(cos_theta):
    return 3.0 / (16.0 * jnp.pi) * (1.0 + cos_theta * cos_theta)


def phase_mie_hazy(cos_theta):
    return (0.5 + 4.5 * jnp.power(0.5 * (1.0 + cos_theta), 8.0)) * INV_4PI


def phase_mie_murky(cos_theta):
    return (0.5 + 16.5 * jnp.power(0.5 * (1.0 + cos_theta), 32.0)) * INV_4PI


def phase_schlick(g, cos_theta):
    """Schlick's HG approximation with pbrt's g -> k polynomial remap."""
    k = 1.55 * g - 0.55 * g * g * g
    kc = k * cos_theta
    return INV_4PI * (1.0 - k * k) / ((1.0 - kc) * (1.0 - kc))


def emission_li(scene, meta, o, d, tmax, pix, samp, dim_base):
    """EmissionIntegrator::Li: ∫ T·σa·Lve. Closed form per homogeneous region."""
    from ..core import rng as rngmod
    kinds = _region_kinds(meta)
    n = o.shape[0]
    L = jnp.zeros((n, 3), jnp.float32)
    T_total = jnp.ones((n, 3), jnp.float32)
    media = scene.get("media")
    if media is None or not kinds:
        return L, T_total
    grids = scene.get("density_grids", ())
    u0 = rngmod.sample_1d(meta.sampler, pix, samp, dim_base)
    for r, kind in enumerate(kinds):
        t0, t1, hit = region_segment(media, r, o, d, tmax)
        seg = jnp.maximum(t1 - t0, 0.0)
        sig_t = media["sigma_a"][r] + media["sigma_s"][r]
        lve = media["le"][r]
        if kind == HOMOGENEOUS:
            # ∫0..L Lve e^{-σt t} dt = Lve (1 - e^{-σt L}) / σt
            T = jnp.exp(-sig_t * seg[..., None])
            Lr = lve * (1.0 - T) / jnp.maximum(sig_t, 1e-9)
        else:
            dt = seg / MAX_MARCH_STEPS

            def body(s, carry):
                Lc, Tc = carry
                t = t0 + (s + u0) * dt
                p = o + t[..., None] * d
                dens = density_at(media, grids, r, kind, p)
                Lc = Lc + Tc * lve * (dens * dt)[..., None]
                Tc = Tc * jnp.exp(-sig_t * (dens * dt)[..., None])
                return (Lc, Tc)

            Lr, T = lax.fori_loop(
                0, MAX_MARCH_STEPS, body,
                (jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32)))
        L = L + jnp.where(hit[..., None], Lr, 0.0)
        T_total = T_total * jnp.where(hit[..., None], T, 1.0)
    return L, T_total


def single_scatter_li(scene, meta, o, d, tmax, pix, samp, dim_base, cfg=None):
    """SingleScatteringIntegrator::Li: march, at each step add σs·phase·T_l·L_l
    for one sampled light, plus emission. fori_loop body with closed-form
    light-segment transmittance for homogeneous-only scenes."""
    from ..core import rng as rngmod
    from . import lights as lt
    from ..kernels import intersect as isect

    kinds = _region_kinds(meta)
    n = o.shape[0]
    media = scene.get("media")
    if media is None or not kinds:
        return (jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32))
    grids = scene.get("density_grids", ())
    n_lights = meta.n_lights
    u0 = rngmod.sample_1d(meta.sampler, pix, samp, dim_base)

    L_out = jnp.zeros((n, 3), jnp.float32)
    T_out = jnp.ones((n, 3), jnp.float32)
    for r, kind in enumerate(kinds):
        t0, t1, hit = region_segment(media, r, o, d, tmax)
        seg = jnp.maximum(t1 - t0, 0.0)
        dt = seg / MAX_MARCH_STEPS
        sig_s = media["sigma_s"][r]
        sig_t = media["sigma_a"][r] + sig_s
        g = media["g"][r]
        lve = media["le"][r]

        def body(s, carry):
            Lc, Tc = carry
            t = t0 + (s + u0) * dt
            p = o + t[..., None] * d
            dens = density_at(media, grids, r, kind, p)
            Lc = Lc + Tc * lve * (dens * dt)[..., None]
            if n_lights > 0:
                sf = s.astype(jnp.uint32)
                ul = rngmod.sample_1d(meta.sampler, pix, samp,
                                     jnp.uint32(dim_base + 1) + sf * jnp.uint32(3))
                u2a = rngmod.sample_1d(meta.sampler, pix, samp,
                                       jnp.uint32(dim_base + 2) + sf * jnp.uint32(3))
                u2b = rngmod.sample_1d(meta.sampler, pix, samp,
                                       jnp.uint32(dim_base + 3) + sf * jnp.uint32(3))
                lidx = jnp.minimum((ul * n_lights).astype(jnp.int32),
                                   n_lights - 1)
                ls = lt.sample_li(scene, lidx, p, u2a, u2b, ul,
                                  meta.light_types, meta.light_image_rows)
                occluded = isect.intersect_p(
                    scene, p + ls["wi"] * 1e-4, ls["wi"],
                    jnp.where(hit, ls["dist"] * (1 - 1e-3), 0.0))
                T_light = transmittance(scene, meta, p, ls["wi"], ls["dist"], u0)
                ph = phase_hg_eval(g, dot(-d, ls["wi"]))
                ok = hit & ~occluded & (ls["pdf"] > 0)
                contrib = (Tc * sig_s * T_light * ls["radiance"]
                           * (dens * dt * ph * n_lights
                              / jnp.maximum(ls["pdf"], 1e-12))[..., None])
                Lc = Lc + jnp.where(ok[..., None], contrib, 0.0)
            Tc = Tc * jnp.exp(-sig_t * (dens * dt)[..., None])
            return (Lc, Tc)

        Lr, T = lax.fori_loop(
            0, MAX_MARCH_STEPS, body,
            (jnp.zeros((n, 3), jnp.float32), jnp.ones((n, 3), jnp.float32)))
        L_out = L_out + jnp.where(hit[..., None], Lr, 0.0)
        T_out = T_out * jnp.where(hit[..., None], T, 1.0)
    return L_out, T_out


def sample_distance(scene, meta, o, d, tmax, u, channel_u):
    """Distance sampling in HOMOGENEOUS media (BASELINE config-5 upgrade):
    t ∝ σt_ch·e^(−σt_ch·t), channel picked uniformly; MIS over channels via the
    spectral average pdf (Wrenninge/Chiang style single-region version)."""
    media = scene.get("media")
    n = o.shape[0]
    if media is None:
        return None
    r = 0
    t0, t1, hit = region_segment(media, r, o, d, tmax)
    sig_t_rgb = media["sigma_a"][r] + media["sigma_s"][r]
    ch = jnp.minimum((channel_u * 3).astype(jnp.int32), 2)
    sig_ch = sig_t_rgb[ch]
    dist = -jnp.log(jnp.maximum(1.0 - u, 1e-12)) / jnp.maximum(sig_ch, 1e-12)
    t = t0 + dist
    in_medium = hit & (t < t1) & (sig_ch > 0)
    seg = jnp.where(in_medium, jnp.maximum(t - t0, 0.0),
                    jnp.maximum(t1 - t0, 0.0))
    tr_rgb = jnp.exp(-sig_t_rgb[None] * seg[..., None])
    pdf_scatter = jnp.mean(sig_t_rgb[None] * tr_rgb, axis=-1)
    pdf_pass = jnp.mean(tr_rgb, axis=-1)
    w_scatter = (tr_rgb * media["sigma_s"][r][None]
                 / jnp.maximum(pdf_scatter, 1e-12)[..., None])
    w_pass = tr_rgb / jnp.maximum(pdf_pass, 1e-12)[..., None]
    return {
        "t": jnp.where(in_medium, t, tmax),
        "in_medium": in_medium,
        "w_scatter": w_scatter,
        "w_pass": jnp.where(hit[..., None], w_pass,
                            jnp.ones((n, 3), jnp.float32)),
        "g": jnp.broadcast_to(media["g"][r], (n,)),
    }
