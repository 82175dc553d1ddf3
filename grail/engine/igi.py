"""Instant GI — pbrt src/integrators/igi.{h,cpp} as a two-phase SPMD program.

Preprocess: shoot `n_paths` light paths per VPL set (light picked from the power
distribution, emission position/direction sampled from the light, BSDF-sampled
continuation with RR), depositing VirtualLight{p, n, contrib} at each non-specular
hit into fixed-capacity SoA arrays (masked validity — the wavefront analog of
igi.cpp's per-task vectors + mutex merge, P3 in SURVEY §2.10).

Li: direct lighting (shared estimate_direct) + for one VPL set per pixel, sum
f(wo, wi)·G·contrib with the G clamp (`gLimit`) and a visibility ray per VPL.
The glossy re-trace ray of the reference is folded into the clamp (divergence
noted: gLimit handles the close-VPL spike identically).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import dot, absdot, normalize, length_sq
from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core.spectrum import luminance
from ..kernels import intersect as isect
from ..shade import bsdf as bx
from ..shade import lights as lt
from ..shade import geometry as geom
from ..shade import materials as mtl
from ..shade.textures import eval_textures

BIG = jnp.float32(1.0e7)
_VPL_DIM_BASE = 50000


def _light_emission_sample(scene, meta, li, u1, u2, u3, u4):
    """Light::Sample_L(scene) — emission position + direction for VPL shooting.

    Area lights: uniform point on the shape set + cosine direction about the
    normal (diffuse emitter). Point/spot: position + uniform/cone direction.
    Distant/infinite: disk at the scene boundary (distant.cpp Sample_L).
    Returns (p, n_l, dir, alpha = L/pdf)."""
    lights = scene["lights"]
    ltype = lights["type"][li]
    n = li.shape[0]
    emit = lights["emit"][li]
    wr = scene["world_radius"]

    p = jnp.zeros((n, 3), jnp.float32)
    d = jnp.zeros((n, 3), jnp.float32)
    alpha = jnp.zeros((n, 3), jnp.float32)

    def put(mask, p_c, d_c, a_c):
        nonlocal p, d, alpha
        p = jnp.where(mask[..., None], p_c, p)
        d = jnp.where(mask[..., None], d_c, d)
        alpha = jnp.where(mask[..., None], a_c, alpha)

    if lt.POINT in meta.light_types or lt.SPOT in meta.light_types:
        lpos = lights["l2w"][li, :3, 3]
        dir_s = mc.uniform_sample_sphere(u3, u4)
        a = emit / mc.uniform_sphere_pdf()
        if lt.POINT in meta.light_types:
            put(ltype == lt.POINT, lpos, dir_s, a)
        if lt.SPOT in meta.light_types:
            # sample inside the cone (spot.cpp Sample_L scene variant)
            cos_total = lights["cos_total"][li]
            wl = mc.uniform_sample_cone(u3, u4, cos_total)
            from ..core import transform as trn
            w_world = trn.xform_v(lights["l2w"][li], wl)
            fall = jnp.clip((wl[..., 2] - cos_total)
                            / jnp.maximum(lights["cos_falloff"][li] - cos_total,
                                          1e-6), 0.0, 1.0) ** 4
            pdf_cone = mc.uniform_cone_pdf(cos_total)
            put(ltype == lt.SPOT, lpos, w_world,
                emit * (fall / jnp.maximum(pdf_cone, 1e-9))[..., None])

    if lt.AREA in meta.light_types:
        wi_dummy = jnp.zeros((n, 3), jnp.float32)
        # sample a point on the light (reuse _area_sample against origin point)
        wi_a, n_l, cos_l, _, _ = lt._area_sample(
            scene, li, jnp.zeros((n, 3), jnp.float32), u1, u2, u3)
        # recompute the position: origin + wi*dist is awkward; sample directly
        cdf = lights["acdf"][li]
        tri_slot = mc.batched_searchsorted(cdf, u3)
        tri = lights["atri"][li, tri_slot]
        idx = scene["tri_idx"][tri]
        v0 = scene["verts"][idx[..., 0]]
        v1 = scene["verts"][idx[..., 1]]
        v2 = scene["verts"][idx[..., 2]]
        b0, b1 = mc.uniform_sample_triangle(u1, u2)
        pl = (b0[..., None] * v0 + b1[..., None] * v1
              + (1.0 - b0 - b1)[..., None] * v2)
        from ..core.vecmath import cross
        nl = normalize(cross(v1 - v0, v2 - v0))
        from ..shade.geometry import REVERSE_ORIENTATION, XFORM_SWAPS_HANDEDNESS
        flags = scene["tri_flags"][tri]
        flip = (((flags & REVERSE_ORIENTATION) != 0)
                ^ ((flags & XFORM_SWAPS_HANDEDNESS) != 0))
        nl = jnp.where(flip[..., None], -nl, nl)
        # cosine-distributed emission direction about nl
        wl = mc.cosine_sample_hemisphere(u4, (u3 * 7919.0) % 1.0)
        from ..core.vecmath import coordinate_system
        s1, s2 = coordinate_system(nl)
        wd = wl[..., 0:1] * s1 + wl[..., 1:2] * s2 + wl[..., 2:3] * nl
        # pdf: (1/area) * cos/pi → alpha = L*area*pi/... using E = L·π·A
        area = lights["area"][li]
        a = emit * (area * jnp.pi)[..., None]
        put(ltype == lt.AREA, pl + nl * 1e-4, wd, a)

    if lt.DISTANT in meta.light_types or lt.INFINITE in meta.light_types:
        # disk at the world boundary shooting inward (distant.cpp Sample_L)
        dx, dy = mc.concentric_sample_disk(u1, u2)
        wdir = jnp.where((ltype == lt.DISTANT)[..., None],
                         -lights["world_dir"][li],
                         -mc.uniform_sample_sphere(u3, u4))
        from ..core.vecmath import coordinate_system
        v1b, v2b = coordinate_system(wdir)
        center = scene.get("world_center",
                           jnp.zeros(3, jnp.float32))
        pdisk = (center + wr * (dx[..., None] * v1b + dy[..., None] * v2b)
                 - wr * wdir)
        a = emit * (jnp.pi * wr * wr)
        m = (ltype == lt.DISTANT) | (ltype == lt.INFINITE)
        put(m, pdisk, wdir, a)

    return p, d, alpha


def generate_vpls(scene, meta, cfg, set_idx):
    """One VPL set: (n_paths × max_depth) candidate VPLs, masked by validity."""
    n_paths = cfg.igi_n_paths
    max_d = cfg.igi_max_depth
    pix = jnp.full((n_paths,), 0x9e37 + set_idx, jnp.uint32)
    samp = jnp.arange(n_paths, dtype=jnp.uint32)

    u_pick = rngmod.sample_1d(meta.sampler, pix, samp, _VPL_DIM_BASE)
    li, pmf = mc.sample_distribution_1d_discrete(scene["light_power_dist"],
                                                 u_pick)
    li = li.astype(jnp.int32)
    us = [rngmod.sample_1d(meta.sampler, pix, samp, _VPL_DIM_BASE + 1 + k)
          for k in range(4)]
    p0, d0, alpha = _light_emission_sample(scene, meta, li, *us)
    alpha = alpha / jnp.maximum(pmf, 1e-9)[..., None] / n_paths

    vpl_p, vpl_n, vpl_c, vpl_ok = [], [], [], []
    o, d = p0 + d0 * 1e-4, d0
    active = jnp.any(alpha > 0, axis=-1)
    throughput = alpha
    for depth in range(max_d):
        hit = isect.intersect(scene, o, d,
                              jnp.where(active, BIG, 0.0)
                              * jnp.ones((n_paths,), jnp.float32))
        live = active & (hit["prim"] >= 0)
        sg = geom.shading_geometry(scene, hit, o, d)
        tex_values = eval_textures(meta.tex_specs, scene["tex_data"], sg,
                                   scene.get("images", ()))
        lobes = mtl.gather_lobes(scene, sg, tex_values)
        wo_l = geom.world_to_local(sg, -d)

        # deposit a VPL at diffuse (non-specular-only) hits
        n_nonspec = bx.bsdf_num_components(lobes, include_specular=False)
        dep = live & (n_nonspec > 0)
        vpl_p.append(sg["p"])
        vpl_n.append(jnp.where(dot(sg["ns"], -d)[..., None] < 0,
                               -sg["ns"], sg["ns"]))
        vpl_c.append(jnp.where(dep[..., None], throughput, 0.0))
        vpl_ok.append(dep)

        # continue
        u1 = rngmod.sample_1d(meta.sampler, pix, samp,
                              _VPL_DIM_BASE + 10 + depth * 4)
        u2 = rngmod.sample_1d(meta.sampler, pix, samp,
                              _VPL_DIM_BASE + 11 + depth * 4)
        uc = rngmod.sample_1d(meta.sampler, pix, samp,
                              _VPL_DIM_BASE + 12 + depth * 4)
        bs = bx.bsdf_sample(lobes, wo_l, u1, u2, uc, meta.lobe_types, True)
        wi_w = geom.local_to_world(sg, bs["wi"])
        contrib = bs["f"] * (absdot(wi_w, sg["ns"])
                             / jnp.maximum(bs["pdf"], 1e-9))[..., None]
        new_tp = throughput * contrib
        # RR on contribution ratio (igi.cpp Preprocess)
        ratio = luminance(new_tp) / jnp.maximum(luminance(throughput), 1e-9)
        q = jnp.minimum(1.0, ratio)
        u_rr = rngmod.sample_1d(meta.sampler, pix, samp,
                                _VPL_DIM_BASE + 13 + depth * 4)
        survive = u_rr < q
        throughput = new_tp / jnp.maximum(q, 1e-6)[..., None]
        active = live & bs["valid"] & survive
        o = sg["p"] + wi_w * sg["ray_eps"][..., None]
        d = wi_w

    return {
        "p": jnp.concatenate(vpl_p),        # (n_paths*max_d, 3)
        "n": jnp.concatenate(vpl_n),
        "contrib": jnp.concatenate(vpl_c),
        "valid": jnp.concatenate(vpl_ok),
    }


def vpl_radiance(scene, meta, cfg, sg, lobes, wo_local, vpls, active):
    """Σ over VPLs of f·G·contrib with gLimit clamp + visibility (igi.cpp Li)."""
    g_limit = cfg.igi_g_limit
    n = sg["p"].shape[0]
    n_vpl = vpls["p"].shape[0]
    L = jnp.zeros((n, 3), jnp.float32)

    def body(k, L):
        vp = vpls["p"][k]
        vn = vpls["n"][k]
        vc = vpls["contrib"][k]
        ok = vpls["valid"][k]
        vec = vp - sg["p"]
        d2 = jnp.maximum(length_sq(vec), 1e-12)
        wi = vec * jax.lax.rsqrt(d2)[..., None]
        G = absdot(wi, sg["ns"]) * absdot(wi, vn) / d2
        G = jnp.minimum(G, g_limit)
        f = bx.bsdf_f(lobes, wo_local, geom.world_to_local(sg, wi),
                      meta.lobe_types, include_specular=False)
        can = active & ok & (G > 0) & jnp.any(f > 0, axis=-1)
        dist = jnp.sqrt(d2)
        occ = isect.intersect_p(
            scene, sg["p"] + wi * sg["ray_eps"][..., None], wi,
            jnp.where(can, dist * (1 - 1e-3), 0.0))
        return L + jnp.where((can & ~occ)[..., None], f * vc * G[..., None], 0.0)

    return jax.lax.fori_loop(0, n_vpl, body, L)
