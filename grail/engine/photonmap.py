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
    radius: float = 0.15          # search radius cap (pbrt "maxdist")
    max_per_cell: int = 16        # photons examined per grid cell
    final_gather: bool = True
    gather_samples: int = 1
    # kNN lookup (pbrt "nlookup"): the density-estimate radius shrinks to the
    # k-th nearest photon's distance, resolved through a radial d² histogram
    # (knn_bins bins) instead of a per-lane heap — the SPMD analog of
    # KdTree::Lookup's ClosePhoton max-heap. 0 = fixed-radius estimate.
    nlookup: int = 32
    knn_bins: int = 16
    # final-gather photon-direction strategy (photonmap.cpp final gather):
    # sample within a cone of cos_gather_angle around nearby indirect photon
    # directions, MIS'd against the BSDF strategy
    n_sample_dirs: int = 8        # photon dirs gathered per point (~nIndirSamplePhotons)
    cos_gather_angle: float = 0.9848077  # cos(10°)


def _shoot_block(scene, meta, cfg: PhotonConfig, samp0, count, seed=0):
    """Trace `count` light paths with sampler indices samp0..samp0+count-1.

    The counter-based sampler makes every path a pure function of its samp
    index, so any partition of [0, n_paths) over devices shoots the same
    photons as one replicated pass (SURVEY §2.10 P3). Returns the raw
    per-(depth, lane) photon SoA (depth-major, matching the replicated
    concatenation order)."""
    n = count
    pix = jnp.full((n,), 0xC0FFEE ^ seed, jnp.uint32)
    samp = samp0 + jnp.arange(n, dtype=jnp.uint32)

    u_pick = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM)
    li, pmf = mc.sample_distribution_1d_discrete(scene["light_power_dist"],
                                                 u_pick)
    li = li.astype(jnp.int32)
    us = [rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 1 + k)
          for k in range(4)]
    p0, d0, alpha = _light_emission_sample(scene, meta, li, *us)
    alpha = alpha / jnp.maximum(pmf, 1e-9)[..., None] / cfg.n_paths

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

    return {
        "p": jnp.concatenate(pts),
        "alpha": jnp.concatenate(alphas),
        "wi": jnp.concatenate(wis),
        "valid": jnp.concatenate(valid),
        "caustic": jnp.concatenate(caustic),
    }


def shoot_photons(scene, meta, cfg: PhotonConfig, seed=0):
    """Trace light paths, returning the photon grid (replicated shoot)."""
    photons = _shoot_block(scene, meta, cfg, jnp.uint32(0), cfg.n_paths, seed)
    return build_photon_grid(scene, photons, cfg)


def shoot_photons_sharded(scene, meta, cfg: PhotonConfig, seed=0,
                          axis="dev"):
    """P3 distributed preprocess: call INSIDE shard_map. Each device shoots a
    disjoint slice of the counter stream (paths [k·per, (k+1)·per)), the
    photon SoA is all_gathered and re-laid-out to the replicated
    depth-major order, so the resulting grid is BITWISE identical to
    shoot_photons on every device (SURVEY §2.10 P3 — PhotonShootingTask
    fan-out + merge, with counters instead of mutexes). Requires n_paths
    divisible by the axis size (PhotonConfig callers round up)."""
    D = jax.lax.axis_size(axis)
    k = jax.lax.axis_index(axis)
    per = cfg.n_paths // D
    block = _shoot_block(scene, meta, cfg, jnp.uint32(k * per), per, seed)

    def regather(x):
        g = jax.lax.all_gather(x, axis)          # (D, max_depth*per, ...)
        g = g.reshape((D, cfg.max_depth, per) + x.shape[1:])
        g = jnp.swapaxes(g, 0, 1)                # (max_depth, D, per, ...)
        return g.reshape((cfg.max_depth * D * per,) + x.shape[1:])

    photons = {key: regather(v) for key, v in block.items()}
    return build_photon_grid(scene, photons, cfg)


def _cell_id(scene, cfg, p):
    """Uniform-grid cell hash keyed off the scene bound."""
    res = 1024  # cells per axis (id packing only; grid is virtual)
    cell = jnp.floor(p / cfg.radius).astype(jnp.int32) & (res - 1)
    return ((cell[..., 0] * res + cell[..., 1]) * res + cell[..., 2])


def build_photon_grid(scene, photons, cfg):
    """Sort photons by grid cell; invalid photons sort to the end (id=max).

    Invalid entries are zeroed: they are masked out of every estimate anyway,
    and their garbage dead-lane values would otherwise differ across batch
    shapes (einsum reassociation), breaking the P3 distributed-shoot
    bitwise-equality contract."""
    ok = photons["valid"]
    cid = jnp.where(ok, _cell_id(scene, cfg, photons["p"]),
                    jnp.int32(2 ** 30))
    order = jnp.argsort(cid)
    z3 = lambda a: jnp.where(ok[..., None], a, 0.0)
    return {
        "p": z3(photons["p"])[order],
        "alpha": z3(photons["alpha"])[order],
        "wi": z3(photons["wi"])[order],
        "valid": ok[order],
        "caustic": (photons["caustic"] & ok)[order],
        "cid": cid[order],
    }


def _neighbor_scan(scene, cfg, pmap, sg, use_caustic, active, fn, init):
    """Fold `fn(carry, idx, ok, d2)` over every candidate photon in the 27
    neighbor cells (the shared chassis of the histogram / estimate passes)."""
    r2 = cfg.radius * cfg.radius
    res = 1024
    base = jnp.floor(sg["p"] / cfg.radius).astype(jnp.int32)
    cid_sorted = pmap["cid"]
    carry = init
    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                cell = (base + jnp.asarray([ox, oy, oz])) & (res - 1)
                cid = ((cell[..., 0] * res + cell[..., 1]) * res
                       + cell[..., 2])
                start = jnp.searchsorted(cid_sorted, cid)
                end = jnp.searchsorted(cid_sorted, cid, side="right")
                end = jnp.minimum(end, start + cfg.max_per_cell)

                def body(k, carry):
                    idx = jnp.minimum(start + k,
                                      cid_sorted.shape[0] - 1)
                    ok = (start + k < end) & pmap["valid"][idx] & active
                    if use_caustic:
                        ok = ok & pmap["caustic"][idx]
                    else:
                        ok = ok & ~pmap["caustic"][idx]
                    d2 = jnp.sum((pmap["p"][idx] - sg["p"]) ** 2, axis=-1)
                    ok = ok & (d2 < r2)
                    return fn(carry, idx, ok, d2)

                carry = jax.lax.fori_loop(0, cfg.max_per_cell, body, carry)
    return carry


def knn_radius2(scene, cfg, pmap, sg, use_caustic, active):
    """Adaptive k-NN search radius² (pbrt photonmap.cpp LookupProc: maxdist²
    shrinks to the nLookup-th nearest photon). Per-lane heaps don't vectorize,
    so the k-th distance is resolved from a radial d² histogram: count
    photons into knn_bins equal-d² shells, then take the first shell where
    the running count reaches nlookup (conservative upper edge). Falls back
    to the full radius when fewer than nlookup photons are in range."""
    n = sg["p"].shape[0]
    r2 = cfg.radius * cfg.radius
    B = cfg.knn_bins

    def acc(hist, idx, ok, d2):
        b = jnp.minimum((d2 / r2 * B).astype(jnp.int32), B - 1)
        return hist + jax.nn.one_hot(b, B, dtype=jnp.float32) * ok[..., None]

    hist = _neighbor_scan(scene, cfg, pmap, sg, use_caustic, active, acc,
                          jnp.zeros((n, B), jnp.float32))
    cum = jnp.cumsum(hist, axis=-1)
    reach = cum >= cfg.nlookup
    kbin = jnp.argmax(reach, axis=-1)          # first bin reaching k
    found = jnp.any(reach, axis=-1)
    rk2 = (kbin + 1).astype(jnp.float32) / B * r2
    return jnp.where(found, rk2, r2)


def radiance_estimate(scene, meta, cfg, pmap, sg, lobes, wo_local, use_caustic,
                      active):
    """Photon density estimate over the 27 neighbor cells.

    With cfg.nlookup > 0 (default): adaptive k-NN radius (knn_radius2) and
    pbrt's Simpson kernel  k(d²) = 3/(π r²)·(1 − d²/r²)²  (photonmap.cpp
    kernel in LPhoton) — tighter caustics than the fixed-radius box kernel.
    With nlookup == 0: the fixed-radius estimate Σ f·α / (π r²)."""
    n = sg["p"].shape[0]
    if cfg.nlookup > 0:
        rk2 = knn_radius2(scene, cfg, pmap, sg, use_caustic, active)
    else:
        rk2 = jnp.full((n,), cfg.radius * cfg.radius, jnp.float32)

    def acc(L, idx, ok, d2):
        ok = ok & (d2 < rk2)
        if cfg.nlookup > 0:
            s = 1.0 - d2 / jnp.maximum(rk2, 1e-12)
            kern = 3.0 / (jnp.pi * jnp.maximum(rk2, 1e-12)) * s * s
        else:
            kern = jnp.full_like(d2, 1.0 / (jnp.pi * cfg.radius * cfg.radius))
        wi_l = geom.world_to_local(sg, pmap["wi"][idx])
        f = bx.bsdf_f(lobes, wo_local, wi_l, meta.lobe_types,
                      include_specular=False)
        return L + jnp.where(ok[..., None],
                             f * pmap["alpha"][idx] * kern[..., None], 0.0)

    return _neighbor_scan(scene, cfg, pmap, sg, use_caustic, active, acc,
                          jnp.zeros((n, 3), jnp.float32))


def gather_photon_dirs(scene, cfg, pmap, sg, active):
    """Up to n_sample_dirs nearby INDIRECT photon incident directions per
    point (pbrt photonmap.cpp nIndirSamplePhotons slots feeding the
    photon-direction gather strategy). Returns (dirs (N,K,3), count (N,))."""
    n = sg["p"].shape[0]
    K = cfg.n_sample_dirs

    def acc(carry, idx, ok, d2):
        dirs, cnt = carry
        slot = jnp.minimum(cnt, K - 1)
        take = ok & (cnt < K)
        oh = jax.nn.one_hot(slot, K, dtype=jnp.float32) * take[..., None]
        dirs = dirs + oh[..., None] * pmap["wi"][idx][:, None, :]
        return dirs, cnt + take.astype(jnp.int32)

    dirs, cnt = _neighbor_scan(
        scene, cfg, pmap, sg, False, active, acc,
        (jnp.zeros((n, K, 3), jnp.float32), jnp.zeros((n,), jnp.int32)))
    return dirs, cnt


def photon_pdf(cfg, dirs, cnt, w):
    """pdf of the photon-direction gather strategy at direction w: average of
    uniform-cone pdfs around each gathered photon direction
    (photonmap.cpp: UniformConePdf over the sampled photon's cone)."""
    cone_pdf = 1.0 / (2.0 * jnp.pi * (1.0 - cfg.cos_gather_angle))
    K = dirs.shape[1]
    in_cone = jnp.sum(dirs * w[:, None, :], axis=-1) > cfg.cos_gather_angle
    slot_ok = jnp.arange(K)[None, :] < cnt[:, None]
    hits = jnp.sum((in_cone & slot_ok).astype(jnp.float32), axis=-1)
    return jnp.where(cnt > 0,
                     hits * cone_pdf / jnp.maximum(cnt.astype(jnp.float32),
                                                   1.0),
                     0.0)


def sample_photon_dir(cfg, dirs, cnt, u_pick, u1, u2):
    """Sample the photon-direction strategy: pick a gathered direction, then
    a uniform direction within its cone (UniformSampleCone about that axis)."""
    K = dirs.shape[1]
    j = jnp.minimum((u_pick * jnp.maximum(cnt, 1).astype(jnp.float32))
                    .astype(jnp.int32), jnp.maximum(cnt - 1, 0))
    axis = jnp.sum(jax.nn.one_hot(j, K, dtype=jnp.float32)[..., None] * dirs,
                   axis=1)
    axis = normalize(axis)
    costheta = 1.0 - u1 * (1.0 - cfg.cos_gather_angle)
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = 2.0 * jnp.pi * u2
    # frame around axis
    up = jnp.where(jnp.abs(axis[..., 2:3]) < 0.9,
                   jnp.asarray([0.0, 0.0, 1.0]), jnp.asarray([1.0, 0.0, 0.0]))
    t1 = normalize(jnp.cross(up, axis))
    t2 = jnp.cross(axis, t1)
    w = (t1 * (sintheta * jnp.cos(phi))[..., None]
         + t2 * (sintheta * jnp.sin(phi))[..., None]
         + axis * costheta[..., None])
    return w, cnt > 0


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
        # two-strategy MIS final gather (photonmap.cpp final gather): one
        # BSDF-sampled ray and one photon-direction-sampled ray (uniform cone
        # around a nearby indirect photon's incident direction), each tracing
        # to a hit shaded by the indirect map, combined with the power
        # heuristic — replaces the single cosine-gather simplification
        pdirs, pcnt = gather_photon_dirs(scene, cfg, pmap, sg, active)

        def gather_ray(w_world, pdf, strat_active):
            o2 = sg["p"] + w_world * sg["ray_eps"][..., None]
            ghit = isect.intersect(
                scene, o2, w_world,
                jnp.where(strat_active, BIG, 0.0) * jnp.ones((n,)))
            gactive = strat_active & (ghit["prim"] >= 0)
            sg2, lobes2, wo2 = _shade_context(scene, meta, ghit, o2, w_world)
            Lg = radiance_estimate(scene, meta, cfg, pmap, sg2, lobes2, wo2,
                                   False, gactive)
            wl = geom.world_to_local(sg, w_world)
            f = bx.bsdf_f(lobes, wo_local, wl, meta.lobe_types, False,
                          tables=scene.get("brdf_tables", ()))
            cosw = absdot(w_world, sg["ns"])
            est = f * Lg * (cosw / jnp.maximum(pdf, 1e-9))[..., None]
            return jnp.where(gactive[..., None], est, 0.0)

        # strategy A: BSDF sample
        uA = rngmod.sample_2d(meta.sampler, pix, samp, _PH_DIM + 110)
        uAc = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 112)
        bs = bx.bsdf_sample(lobes, wo_local, uA[0], uA[1], uAc,
                            meta.lobe_types, include_specular=False,
                            tables=scene.get("brdf_tables", ()))
        wA = geom.local_to_world(sg, bs["wi"])
        actA = active & bs["valid"] & (bs["pdf"] > 0.0)
        pdfA_ph = photon_pdf(cfg, pdirs, pcnt, wA)
        # with no photon dirs the photon strategy is unavailable: weight 1
        wMISA = jnp.where(pcnt > 0,
                          mc.power_heuristic(1.0, bs["pdf"], 1.0, pdfA_ph),
                          1.0)
        L += wMISA[..., None] * gather_ray(wA, bs["pdf"], actA)

        # strategy B: photon-direction cone sample
        uB = rngmod.sample_2d(meta.sampler, pix, samp, _PH_DIM + 113)
        uBp = rngmod.sample_1d(meta.sampler, pix, samp, _PH_DIM + 115)
        wB, okB = sample_photon_dir(cfg, pdirs, pcnt, uBp, uB[0], uB[1])
        pdfB = photon_pdf(cfg, pdirs, pcnt, wB)
        actB = active & okB & (pdfB > 0.0)
        pdfB_bsdf = bx.bsdf_pdf(lobes, wo_local, geom.world_to_local(sg, wB),
                                meta.lobe_types, include_specular=False)
        wMISB = mc.power_heuristic(1.0, pdfB, 1.0, pdfB_bsdf)
        L += wMISB[..., None] * gather_ray(wB, pdfB, actB)
    else:
        L += jnp.where(active[..., None],
                       radiance_estimate(scene, meta, cfg, pmap, sg, lobes,
                                         wo_local, False, active), 0.0)
    return L * rays["weight"][..., None]
