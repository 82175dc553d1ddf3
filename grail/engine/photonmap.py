"""Photon mapping — pbrt src/integrators/photonmap.{h,cpp} re-architected for SPMD.

Shooting (PhotonShootingTask analog): power-CDF light pick → emission sample →
BSDF-sampled walk with RR; photons {p, alpha, wi} deposited at non-specular hits,
classified caustic (pure-specular history) vs indirect — fixed-capacity SoA with
validity masks instead of mutex-merged vectors (SURVEY §2.10 P3).

Lookup: instead of a balanced KdTree (core/kdtree.h), photons are binned to a
uniform grid with cell edge = search radius, sorted by cell id; a query scans the
27 neighbor cells through start/end ranges (sorted-array searchsorted) — the
Morton-bucket k-NN replacement named in SURVEY §2.1. Density estimate uses the
fixed-radius kernel L ≈ Σ f(wo, wi_j)·α_j / (π r²).

Li: direct (shared estimate_direct path) + caustic map at the first hit + one
cosine-sampled final-gather bounce shaded by the indirect map (the reference's
two-strategy MIS gather is simplified to cosine gather; documented divergence).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.vecmath import dot, absdot, normalize
from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core.spectrum import luminance
from ..kernels import intersect as isect
from ..shade import bsdf as bx
from ..shade import lights as lt
from ..shade import geometry as geom
from ..shade import materials as mtl
from ..shade.textures import eval_textures
from .igi import _light_emission_sample

BIG = jnp.float32(1.0e7)
_PH_DIM = 70000


@dataclasses.dataclass(frozen=True)
class PhotonConfig:
    n_paths: int = 4096           # light paths to shoot
    max_depth: int = 5
    radius: float = 0.15          # fixed-radius estimate (pbrt "maxdist")
    max_per_cell: int = 16        # photons examined per grid cell
    final_gather: bool = True
    gather_samples: int = 1


def shoot_photons(scene, meta, cfg: PhotonConfig, seed=0):
    """Trace light paths, returning photon SoA + caustic/indirect masks."""
    n = cfg.n_paths
    pix = jnp.full((n,), 0xC0FFEE ^ seed, jnp.uint32)
    samp = jnp.arange(n, dtype=jnp.uint32)

    u_pick = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM)
    li, pmf = mc.sample_distribution_1d_discrete(scene["light_power_dist"],
                                                 u_pick)
    li = li.astype(jnp.int32)
    us = [rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 1 + k)
          for k in range(4)]
    p0, d0, alpha = _light_emission_sample(scene, meta, li, *us)
    alpha = alpha / jnp.maximum(pmf, 1e-9)[..., None] / n

    pts, alphas, wis, valid, caustic = [], [], [], [], []
    o, d = p0 + d0 * 1e-4, d0
    active = jnp.any(alpha > 0, axis=-1)
    throughput = alpha
    specular_only = jnp.ones((n,), jnp.bool_)
    for depth in range(cfg.max_depth):
        hit = isect.intersect(scene, o, d,
                              jnp.where(active, BIG, 0.0) * jnp.ones((n,)))
        live = active & (hit["prim"] >= 0)
        sg = geom.shading_geometry(scene, hit, o, d)
        tex_values = eval_textures(meta.tex_specs, scene["tex_data"], sg,
                                   scene.get("images", ()))
        lobes = mtl.gather_lobes(scene, sg, tex_values)
        wo_l = geom.world_to_local(sg, -d)

        n_nonspec = bx.bsdf_num_components(lobes, include_specular=False)
        dep = live & (n_nonspec > 0) & (depth > 0)  # skip direct (depth 0)
        pts.append(sg["p"])
        alphas.append(jnp.where(dep[..., None], throughput, 0.0))
        wis.append(-d)
        valid.append(dep)
        caustic.append(dep & specular_only)

        u1 = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 10 + depth * 4)
        u2 = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 11 + depth * 4)
        uc = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 12 + depth * 4)
        bs = bx.bsdf_sample(lobes, wo_l, u1, u2, uc, meta.lobe_types, True)
        wi_w = geom.local_to_world(sg, bs["wi"])
        contrib = bs["f"] * (absdot(wi_w, sg["ns"])
                             / jnp.maximum(bs["pdf"], 1e-9))[..., None]
        new_tp = throughput * contrib
        ratio = luminance(new_tp) / jnp.maximum(luminance(throughput), 1e-9)
        q = jnp.minimum(1.0, ratio)
        u_rr = rngmod.sample_1d(meta.sampler, pix, samp,
                                _PH_DIM + 13 + depth * 4)
        survive = u_rr < q
        throughput = new_tp / jnp.maximum(q, 1e-6)[..., None]
        specular_only = specular_only & bs["specular"]
        active = live & bs["valid"] & survive
        o = sg["p"] + wi_w * sg["ray_eps"][..., None]
        d = wi_w

    photons = {
        "p": jnp.concatenate(pts),
        "alpha": jnp.concatenate(alphas),
        "wi": jnp.concatenate(wis),
        "valid": jnp.concatenate(valid),
        "caustic": jnp.concatenate(caustic),
    }
    return build_photon_grid(scene, photons, cfg)


def _cell_id(scene, cfg, p):
    """Uniform-grid cell hash keyed off the scene bound."""
    res = 1024  # cells per axis (id packing only; grid is virtual)
    cell = jnp.floor(p / cfg.radius).astype(jnp.int32) & (res - 1)
    return ((cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2])


def build_photon_grid(scene, photons, cfg):
    """Sort photons by grid cell; invalid photons sort to the end (id=max)."""
    cid = jnp.where(photons["valid"], _cell_id(scene, cfg, photons["p"]),
                    jnp.int32(2 ** 30))
    order = jnp.argsort(cid)
    return {
        "p": photons["p"][order],
        "alpha": photons["alpha"][order],
        "wi": photons["wi"][order],
        "valid": photons["valid"][order],
        "caustic": photons["caustic"][order],
        "cid": cid[order],
    }


def radiance_estimate(scene, meta, cfg, pmap, sg, lobes, wo_local, use_caustic,
                      active):
    """L ≈ Σ_nbr f(wo, wi_j)·α_j / (π r²) over the 27 neighbor cells."""
    n = sg["p"].shape[0]
    r2 = cfg.radius * cfg.radius
    res = 1024
    base = jnp.floor(sg["p"] / cfg.radius).astype(jnp.int32)
    L = jnp.zeros((n, 3), jnp.float32)
    cid_sorted = pmap["cid"]

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                cell = (base + jnp.asarray([ox, oy, oz])) & (res - 1)
                cid = ((cell[..., 0] * res + cell[..., 1]) * res
                       + cell[..., 2])
                start = jnp.searchsorted(cid_sorted, cid)
                end = jnp.searchsorted(cid_sorted, cid, side="right")
                end = jnp.minimum(end, start + cfg.max_per_cell)

                def body(k, L):
                    idx = jnp.minimum(start + k,
                                      cid_sorted.shape[0] - 1)
                    ok = (start + k < end) & pmap["valid"][idx] & active
                    if use_caustic:
                        ok = ok & pmap["caustic"][idx]
                    else:
                        ok = ok & ~pmap["caustic"][idx]
                    pp = pmap["p"][idx]
                    d2 = jnp.sum((pp - sg["p"]) ** 2, axis=-1)
                    ok = ok & (d2 < r2)
                    wi_l = geom.world_to_local(sg, pmap["wi"][idx])
                    f = bx.bsdf_f(lobes, wo_local, wi_l, meta.lobe_types,
                                  include_specular=False)
                    return L + jnp.where(ok[..., None],
                                         f * pmap["alpha"][idx], 0.0)

                L = jax.lax.fori_loop(0, cfg.max_per_cell, body, L)
    return L / (jnp.pi * r2)


def photon_li(scene, meta, cfg: PhotonConfig, icfg, rays, pix, samp, pmap):
    """PhotonIntegrator::Li: direct + caustic estimate + final gather."""
    from .integrator import estimate_direct, _shade_context, _pick_light

    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    hit = isect.intersect(scene, o, d, BIG * jnp.ones((n,)))
    active = hit["prim"] >= 0
    L = jnp.where((~active)[..., None],
                  lt.escaped_radiance(scene, d, meta.light_types), 0.0)
    sg, lobes, wo_local = _shade_context(scene, meta, hit, o, d)
    if lt.AREA in meta.light_types:
        L += jnp.where(active[..., None],
                       lt.area_light_emitted(scene, sg, -d), 0.0)

    if meta.n_lights > 0:
        lidx, pmf = _pick_light(scene, meta, icfg, pix, samp, 0, active)
        Ld = estimate_direct(
            scene, meta, sg, lobes, wo_local, lidx, pmf,
            rngmod.sample_2d(meta.sampler, pix, samp, _PH_DIM + 100),
            rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 101),
            rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 102),
            rngmod.sample_2d(meta.sampler, pix, samp, _PH_DIM + 103),
            active)
        L += jnp.where(active[..., None], Ld, 0.0)

    # caustics: direct density estimate at the first hit
    L += jnp.where(active[..., None],
                   radiance_estimate(scene, meta, cfg, pmap, sg, lobes,
                                     wo_local, True, active), 0.0)

    if cfg.final_gather:
        # one cosine-sampled gather ray shaded by the indirect map
        u1 = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 110)
        u2 = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 111)
        wl = mc.cosine_sample_hemisphere(u1, u2)
        w = geom.local_to_world(sg, wl)
        w = jnp.where(dot(w, sg["ng"])[..., None] < 0.0, -w, w)
        ghit = isect.intersect(scene, sg["p"] + w * sg["ray_eps"][..., None],
                               w, jnp.where(active, BIG, 0.0) * jnp.ones((n,)))
        gactive = active & (ghit["prim"] >= 0)
        sg2, lobes2, wo2 = _shade_context(
            scene, meta, ghit, sg["p"] + w * sg["ray_eps"][..., None], w)
        Lg = radiance_estimate(scene, meta, cfg, pmap, sg2, lobes2, wo2,
                               False, gactive)
        f = bx.bsdf_f(lobes, wo_local, wl, meta.lobe_types, False)
        # cosine pdf cancels |cos|/π: L += f·Lg·π... E[f·Lg·cos/pdf] = f·Lg·π
        L += jnp.where(gactive[..., None], f * Lg * jnp.pi, 0.0)
    else:
        L += jnp.where(active[..., None],
                       radiance_estimate(scene, meta, cfg, pmap, sg, lobes,
                                         wo_local, False, active), 0.0)
    return L * rays["weight"][..., None]
