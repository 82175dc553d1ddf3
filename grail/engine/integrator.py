"""Surface integrators — pbrt src/integrators/{path,directlighting,whitted,
ambientocclusion} + src/core/integrator.cpp (UniformSampleOneLight/AllLights,
EstimateDirect) re-architected as a masked wavefront loop.

The reference recurses per ray (PathIntegrator::Li, path.cpp ~L50); here each bounce
is one SPMD stage over the whole ray batch with an `active` mask: intersect →
shade (texture eval + lobe gather) → estimate_direct (MIS light+BSDF branches,
PowerHeuristic) → sample continuation → Russian roulette. The bounce loop is a
static Python loop so every sampler dimension is static (counter-based RNG).

Differentiability: all sampling decisions (u's, discrete picks, RR) are inherently
detached (pure-hash constants); pdfs dividing the estimator are stop_gradient'ed
(detached-sampling reparameterization) so gradients flow through f, Le, and camera
terms unbiasedly for parameters that do not move discontinuities.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot, normalize
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

# sampler dimension slots (static layout)
SLOT_FILM = 0
SLOT_LENS = 1
SLOT_TIME = 2
_BOUNCE_BASE = 4
_BOUNCE_STRIDE = 8
# per-bounce offsets
_D_LIGHT_SEL = 0
_D_LIGHT_POS = 1   # 2D
_D_LIGHT_TRI = 2
_D_BSDF_COMP = 3
_D_BSDF_DIR = 4    # 2D
_D_RR = 5
_D_MIS_COMP = 6
_D_MIS_DIR = 7     # 2D


@dataclasses.dataclass(frozen=True)
class IntegratorConfig:
    kind: str = "path"            # path | direct | whitted | ao
    max_depth: int = 5
    rr_depth: int = 3             # RR starts after this many bounces (pbrt: 3)
    # wavefront compaction (SURVEY §2.10 P8): after the first Russian-roulette
    # bounce, repack surviving lanes into a compact_frac-width buffer and run
    # the remaining bounces there (stable-partition gather; falls back to the
    # full-width loop in the rare wave where survivors exceed the capacity, so
    # the estimator is exact either way)
    compact: bool = True
    compact_frac: float = 0.25    # tail capacity (Cornell occupancy after the
    # first RR is ~4%; a wave overflowing the cap falls back to full width)
    compact_min: int = 8192       # lane count below which compaction is skipped
    # material-sorted megabatch shading (SURVEY §2.5 TPU-equiv; shade/
    # megabatch.py): counting-sort the shade queue by material id each bounce
    # and run per-material-SPECIALIZED texture+lobe kernels over uniform
    # blocks. Bitwise-equal to the masked path. DEFAULT OFF: measured on TPU
    # v5e the in-graph permutes cost ~10x the whole shading pass they would
    # specialize (see shade/megabatch.py header for the numbers) — the masked
    # path is already compile-time specialized over the scene's static sets.
    mat_sort: bool = False
    mat_sort_min: int = 16384
    mat_block: int = 8192         # sorted-queue block size (lanes per switch)
    light_strategy: str = "one"   # one (uniform) | power | all
    ao_samples: int = 1
    ao_maxdist: float = 1.0e7
    vol: str = "emission"         # volume integrator: emission | single
    vol_stepsize: float = 0.1     # accepted for pbrt parity (march is fixed-lane)
    # instant GI (igi.cpp): VPL paths per set, sets, shoot depth, G clamp
    igi_n_paths: int = 64
    igi_n_sets: int = 4
    igi_max_depth: int = 3
    igi_g_limit: float = 10.0
    # photon mapping (photonmap.cpp)
    photon_paths: int = 4096
    photon_radius: float = 0.15
    photon_final_gather: bool = True
    # PRT (diffuseprt/glossyprt/useprobes + createprobes baking)
    prt_lmax: int = 4
    prt_nsamples: int = 64
    prt_kd: tuple = (0.5, 0.5, 0.5)   # glossyprt.cpp "Kd"/"Ks"/"roughness"
    prt_ks: tuple = (0.4, 0.4, 0.4)
    prt_roughness: float = 0.1
    probes_file: str = ""          # useprobes "filename" (empty = bake inline)
    probes_res: tuple = (4, 4, 4)  # inline-bake grid resolution
    # irradiance cache (irradiancecache.cpp)
    ic_nsamples: int = 64          # hemisphere gather rays per cache point
    ic_grid: tuple = (16, 16, 16)  # cache-point seed grid (octree analog)
    ic_maxerror: float = 0.2       # Ward weight cutoff ("maxerror" param)
    # dipole subsurface (dipolesubsurface.cpp)
    sss_npoints: int = 1024        # surface sample points (surfacepoints.cpp)
    sss_maxerror: float = 0.05
    sss_sigma_a: tuple = (0.0011, 0.0024, 0.014)    # skin1 defaults (volume.cpp)
    sss_sigma_s: tuple = (2.55, 3.21, 3.77)
    sss_eta: float = 1.3


def _bdim(bounce, off):
    return _BOUNCE_BASE + bounce * _BOUNCE_STRIDE + off


# ---------------------------------------------------------------- alpha cutout
# pbrt tests the alpha texture inside Triangle::Intersect (trianglemesh.cpp
# ~L230). The wavefront equivalent: intersect, evaluate alpha at the hit's
# interpolated uv, and re-trace the (few) lanes that landed on a zero-alpha
# point with tmin pushed past the hit — up to ALPHA_MAX_REJECT rounds; lanes
# without a cutout hit are inert in the re-trace.
ALPHA_MAX_REJECT = 4


def _alpha_at(scene, meta, hit, o, d):
    """Alpha value at each hit (1.0 for misses / non-alpha triangles)."""
    from ..shade.textures import eval_texture_rows
    sg = geom.shading_geometry(scene, hit, o, d)
    vals = eval_texture_rows(meta.tex_specs, scene["tex_data"], sg,
                             set(meta.alpha_rows), scene.get("images", ()))
    prim = jnp.maximum(hit["prim"], 0)
    row = scene["tri_alpha"][prim]
    a = jnp.ones(prim.shape, jnp.float32)
    for r in meta.alpha_rows:
        a = jnp.where(row == r, vals[r][:, 0], a)
    return jnp.where((hit["prim"] >= 0) & (row >= 0), a, 1.0)


def scene_intersect(scene, meta, o, d, tmax, tmin=None, time=None,
                    sort=None):
    """Scene::Intersect with alpha-cutout re-tracing when the scene has
    alpha-mapped triangles (meta.alpha_rows non-empty). sort: ray re-binning
    hint for the stream kernel (False for camera waves, which are already in
    tile order — binning them costs more than it saves)."""
    hit = isect.intersect(scene, o, d, tmax, tmin, time=time, sort=sort)
    if not getattr(meta, "alpha_rows", ()):
        return hit
    for _ in range(ALPHA_MAX_REJECT):
        a = _alpha_at(scene, meta, hit, o, d)
        cut = (hit["prim"] >= 0) & (a <= 0.0)
        t2min = jnp.where(cut, hit["t"] * (1.0 + 1e-4) + 1e-5, 3.0e37)
        t2max = jnp.where(cut, tmax, -3.0e37)
        hit2 = isect.intersect(scene, o, d, t2max, t2min, time=time)
        hit = {k: jnp.where(cut, hit2[k], hit[k]) for k in hit}
    # still on a cutout after the cap: call it a miss
    out = dict(hit)
    a = _alpha_at(scene, meta, hit, o, d)
    cut = (hit["prim"] >= 0) & (a <= 0.0)
    out["t"] = jnp.where(cut, isect.BIG_T, hit["t"])
    out["prim"] = jnp.where(cut, -1, hit["prim"])
    if "inst" in out:   # don't leave a phantom instance id on a rejected hit
        out["inst"] = jnp.where(cut, -1, hit["inst"])
    return out


def scene_intersect_p(scene, meta, o, d, tmax, tmin=None, time=None):
    """Scene::IntersectP honoring alpha cutouts (closest-hit loop when the
    scene has them; plain any-hit otherwise)."""
    if not getattr(meta, "alpha_rows", ()):
        return isect.intersect_p(scene, o, d, tmax, tmin, time=time)
    return scene_intersect(scene, meta, o, d, tmax, tmin,
                           time=time)["prim"] >= 0


def _shade_geom(scene, meta, hit, o, d, camdiff=None, is_primary=None,
                zero_duv=False, time=None):
    """Material-independent post-hit work: shading geometry, differentials,
    bump. The material-sorted megabatch path stops here and defers textures
    and lobes to the per-material-specialized sorted pass.

    camdiff: optional (rx_o, rx_d, ry_o, ry_d) camera differential rays;
    is_primary: traced bool scalar — uv screen derivatives are computed only
    on the primary (bounce-0) wave, as pbrt only carries RayDifferentials on
    camera/specular rays. zero_duv: emit zero differentials when camdiff is
    absent (the compacted tail phase, which is never primary — matches the
    full-width loop's where(is_primary, ., 0) masking)."""
    sg = geom.shading_geometry(scene, hit, o, d, time=time)
    if camdiff is not None:
        duvdx, duvdy = geom.uv_differentials(sg, *camdiff)
        keep = is_primary if is_primary is not None else True
        sg["duvdx"] = jnp.where(keep, duvdx, jnp.zeros_like(duvdx))
        sg["duvdy"] = jnp.where(keep, duvdy, jnp.zeros_like(duvdy))
    elif zero_duv and getattr(meta, "n_images", 0) > 0:
        z = jnp.zeros(sg["p"].shape[:-1] + (2,), jnp.float32)
        sg["duvdx"] = z
        sg["duvdy"] = z
    if getattr(meta, "has_bump", False):
        sg = _apply_bump(scene, meta, sg)
    return sg


def _shade_context(scene, meta, hit, o, d, camdiff=None, is_primary=None,
                   zero_duv=False, time=None):
    """Common post-hit work: shading geometry, bump, textures, lobes, local
    wo — the unsorted (masked, all-materials) path."""
    sg = _shade_geom(scene, meta, hit, o, d, camdiff=camdiff,
                     is_primary=is_primary, zero_duv=zero_duv, time=time)
    tex_values = eval_textures(meta.tex_specs, scene["tex_data"], sg,
                               scene.get("images", ()),
                               scene.get("mipmaps", ()))
    lobes = mtl.gather_lobes(scene, sg, tex_values)
    wo_local = geom.world_to_local(sg, -d)
    return sg, lobes, wo_local


def _apply_bump(scene, meta, sg):
    """Material::Bump (pbrt material.cpp ~L20): finite-difference the
    displacement texture along dpdu/dpdv and shear the shading frame."""
    from ..shade.textures import eval_texture_rows
    from ..core.vecmath import cross, normalize as vnorm

    rows = getattr(meta, "bump_rows", ())
    if not rows:
        return sg

    bump_tex = scene["materials"]["bump"][jnp.maximum(sg["mat"], 0)]  # (N,)
    has = bump_tex >= 0
    bt = jnp.maximum(bump_tex, 0)

    du = 0.01  # pbrt fallback offset when no differentials
    def displacement(sg_eval):
        vals = eval_texture_rows(meta.tex_specs, scene["tex_data"], sg_eval,
                                 rows, scene.get("images", ()))
        # one-hot contraction instead of a 2D advanced-index gather (the
        # latter hits a pathologically slow XLA:TPU gather compile path)
        oh = jax.nn.one_hot(bt, vals.shape[0], dtype=jnp.float32)  # (N,R)
        return jnp.einsum("nr,rn->n", oh, vals[..., 0], precision="highest")

    d0 = displacement(sg)
    sg_u = dict(sg)
    sg_u["p"] = sg["p"] + du * sg["dpdu"]
    sg_u["uv"] = sg["uv"] + jnp.asarray([du, 0.0])
    d_u = displacement(sg_u)
    sg_v = dict(sg)
    sg_v["p"] = sg["p"] + du * sg["dpdv"]
    sg_v["uv"] = sg["uv"] + jnp.asarray([0.0, du])
    d_v = displacement(sg_v)

    dpdu_b = sg["dpdu"] + ((d_u - d0) / du)[..., None] * sg["ns"]
    dpdv_b = sg["dpdv"] + ((d_v - d0) / du)[..., None] * sg["ns"]
    ns_b = vnorm(cross(dpdu_b, dpdv_b))
    # keep orientation consistent with the original shading normal
    ns_b = jnp.where(dot(ns_b, sg["ns"])[..., None] < 0.0, -ns_b, ns_b)
    ss_b = vnorm(dpdu_b - ns_b * dot(ns_b, dpdu_b)[..., None])
    ts_b = cross(ns_b, ss_b)

    out = dict(sg)
    out["ns"] = jnp.where(has[..., None], ns_b, sg["ns"])
    out["ss"] = jnp.where(has[..., None], ss_b, sg["ss"])
    out["ts"] = jnp.where(has[..., None], ts_b, sg["ts"])
    return out


def _detach(x):
    return jax.lax.stop_gradient(x)


def estimate_direct(scene, meta, sg, lobes, wo_local, light_idx, light_pmf,
                    u_light, u_tri, u_comp, u_dir, active, time=None,
                    bsdf_branch=True, precomputed=None, ls=None):
    """One-light direct lighting with MIS (pbrt integrator.cpp EstimateDirect).

    light_idx (N,): chosen light row; light_pmf (N,): its selection probability.
    Returns Ld (N,3) already divided by light_pmf.

    bsdf_branch=False drops the BSDF-sampling branch (and its traversal): the
    path integrator covers that strategy by REUSING its continuation ray — the
    next bounce's hit/escape adds MIS-weighted emission (path-vertex reuse;
    one closest-hit traversal per bounce instead of two). Whitted/direct/igi
    and the utility integrators keep the classic two-branch form.

    precomputed: optional (f_l, bsdf_pdf_l) from the material-sorted megabatch
    pass — the light-branch BSDF values for the light sample `ls` (which must
    then also be supplied); lobes/wo_local are unused in that case.
    """
    present = meta.lobe_types
    p = sg["p"]
    eps = sg["ray_eps"]

    # ---- light-sampling branch
    if ls is None:
        ls = lt.sample_li(scene, light_idx, p, u_light[0], u_light[1], u_tri,
                          meta.light_types, meta.light_image_rows)
    if precomputed is not None:
        f_l, bsdf_pdf_l = precomputed
    else:
        wi_l = geom.world_to_local(sg, ls["wi"])
        f_l = bx.bsdf_f(lobes, wo_local, wi_l, present, include_specular=False,
                        tables=scene.get("brdf_tables", ()))
    cos_l = absdot(ls["wi"], sg["ns"])
    contrib_possible = active & (ls["pdf"] > 0.0) & (cos_l > 0.0) \
        & jnp.any(ls["radiance"] > 0.0, axis=-1) & jnp.any(f_l > 0.0, axis=-1)
    # shadow ray (only meaningful where contrib possible; traced for all lanes)
    occluded = scene_intersect_p(
        scene, meta, p + ls["wi"] * eps[..., None], ls["wi"],
        jnp.where(contrib_possible, ls["dist"] - 2.0 * eps, 0.0), time=time)
    radiance = ls["radiance"]
    if scene.get("media") is not None:
        # VisibilityTester::Transmittance through participating media
        from ..shade import media as med
        radiance = radiance * med.transmittance(
            scene, meta, p, ls["wi"], ls["dist"], jnp.full_like(cos_l, 0.5))
    if precomputed is None:
        bsdf_pdf_l = bx.bsdf_pdf(lobes, wo_local, wi_l, present,
                                 include_specular=False)
    w_l = jnp.where(ls["delta"], 1.0,
                    mc.power_heuristic(1.0, ls["pdf"], 1.0, bsdf_pdf_l))
    Ld = jnp.where(
        (contrib_possible & ~occluded)[..., None],
        f_l * radiance * (cos_l * w_l / _detach(jnp.maximum(ls["pdf"], 1e-12)))[..., None],
        0.0)

    # ---- BSDF-sampling branch (non-delta lights only; pbrt EstimateDirect part 2)
    sampleable = (lt.AREA in meta.light_types) or (lt.INFINITE in meta.light_types)
    if sampleable and bsdf_branch:
        bs = bx.bsdf_sample(lobes, wo_local, u_dir[0], u_dir[1], u_comp, present,
                            tables=scene.get("brdf_tables", ()),
                            include_specular=False)
        wi_w = geom.local_to_world(sg, bs["wi"])
        cos_b = absdot(wi_w, sg["ns"])
        can = active & bs["valid"] & (bs["pdf"] > 0.0) \
            & ~lt.is_delta(scene["lights"]["type"][light_idx])
        hit2 = scene_intersect(scene, meta, p + wi_w * eps[..., None], wi_w,
                               jnp.where(can, BIG, 0.0) * jnp.ones_like(eps),
                               time=time)
        light_pdf_dir = jnp.zeros_like(bs["pdf"])
        Li2 = jnp.zeros_like(Ld)
        hit_light = jnp.zeros(p.shape[0], jnp.bool_)
        if lt.AREA in meta.light_types:
            # hit the chosen area light?
            hit_prim = jnp.maximum(hit2["prim"], 0)
            hit_light_id = (hit2["tri"]["light"] if "tri" in hit2
                            else scene["tri_light"][hit_prim])
            hit_is_chosen = (hit2["prim"] >= 0) & (hit_light_id == light_idx)
            hg2 = geom.hit_geometric(scene, hit2)
            cos_at_light = dot(hg2["ng"], -wi_w)
            lp = lt.area_light_pdf_dir(scene, light_idx, p, wi_w,
                                        hit2["t"], cos_at_light)
            Le2 = lt.area_light_emitted(scene, hg2, -wi_w)
            light_pdf_dir = jnp.where(hit_is_chosen, lp, light_pdf_dir)
            Li2 = jnp.where(hit_is_chosen[..., None], Le2, Li2)
            hit_light = hit_light | hit_is_chosen
        if lt.INFINITE in meta.light_types:
            is_env = scene["lights"]["type"][light_idx] == lt.INFINITE
            escaped = hit2["prim"] < 0
            m = is_env & escaped
            light_pdf_dir = jnp.where(m, lt.env_pdf(scene, light_idx, wi_w),
                                      light_pdf_dir)
            Li2 = jnp.where(m[..., None], lt.env_radiance(scene, light_idx, wi_w),
                            Li2)
            hit_light = hit_light | m
        w_b = mc.power_heuristic(1.0, bs["pdf"], 1.0, light_pdf_dir)
        Ld += jnp.where(
            (can & hit_light & (light_pdf_dir > 0.0))[..., None],
            bs["f"] * Li2 * (cos_b * w_b / _detach(jnp.maximum(bs["pdf"], 1e-12)))[..., None],
            0.0)

    return Ld / _detach(jnp.maximum(light_pmf, 1e-12))[..., None]


def _pick_light(scene, meta, cfg, pix, samp, bounce, active):
    """UniformSampleOneLight light choice (or power-weighted)."""
    n_lights = meta.n_lights
    u = rngmod.sample_1d(meta.sampler, pix, samp, _bdim(bounce, _D_LIGHT_SEL))
    if cfg.light_strategy == "power":
        idx, pmf = mc.sample_distribution_1d_discrete(scene["light_power_dist"], u)
        return idx.astype(jnp.int32), pmf
    idx = jnp.minimum((u * n_lights).astype(jnp.int32), n_lights - 1)
    pmf = jnp.full(u.shape, 1.0 / n_lights, jnp.float32)
    return idx, pmf


def _make_bounce_body(scene, meta, cfg, pix, samp, camdiff, n, vpls, has_media,
                      time=None):
    """Build the per-bounce SPMD stage closure over a fixed lane width `n`.

    pix/samp are (n,) sampler coordinates; camdiff optional camera
    differential rays (primary-wave texture footprints only). The factory form
    lets the compacted tail phase re-instantiate the body at a narrower width
    with gathered sampler coordinates (SURVEY §2.10 P8)."""

    # path-vertex reuse (path kind only): the continuation BSDF sample serves
    # as the MIS-BSDF strategy — emission found at the NEXT hit (or env
    # escape) is added with the power-heuristic weight against the light
    # strategy, instead of estimate_direct tracing a second closest-hit ray
    # per bounce. Whitted/direct/igi keep the classic two-branch form.
    path_reuse = cfg.kind == "path"
    # material-sorted megabatch shading (shade/megabatch.py): bitwise-equal,
    # so gated purely on profitability (enough lanes to amortize the sort)
    use_mb = (path_reuse and cfg.mat_sort
              and len(getattr(meta, "mat_specs", ())) > 0
              and n >= cfg.mat_sort_min and cfg.light_strategy != "all")

    def bounce_body(bounce, state):
        o, d, L, throughput, active, spec_bounce, pdf_prev = state
        # peeled bounce 0 passes a CONCRETE int: camera waves arrive in tile
        # order, so skip the ray re-binning for their closest hit
        first = isinstance(bounce, int) and bounce == 0
        eps = jnp.zeros((n,), jnp.float32)
        hit = scene_intersect(scene, meta, o, d,
                              jnp.where(active, BIG, 0.0) * jnp.ones_like(eps),
                              time=time, sort=(False if first else None))
        miss = hit["prim"] < 0

        if has_media:
            from ..shade import media as med
            seg_t = jnp.where(miss, BIG, hit["t"])

            def camera_seg(_):
                # renderer-level volume Li on the camera segment
                # (samplerrenderer.cpp: T·Lsurf + Lv)
                if cfg.vol == "single" and meta.n_lights > 0:
                    return med.single_scatter_li(
                        scene, meta, o, d, seg_t, pix, samp, 3000, cfg)
                return med.emission_li(scene, meta, o, d, seg_t, pix, samp, 3000)

            def secondary_seg(_):
                # secondary segments attenuate only (Renderer::Transmittance)
                u_j = rngmod.sample_1d(meta.sampler, pix, samp,
                                       3001 + bounce * 300)
                return (jnp.zeros((n, 3), jnp.float32),
                        med.transmittance(scene, meta, o, d, seg_t, u_j))

            Lv, T_seg = jax.lax.cond(bounce == 0, camera_seg, secondary_seg, None)
            L += jnp.where(active[..., None], Lv, 0.0)
            throughput = throughput * jnp.where(active[..., None], T_seg, 1.0)

        # escaped: env radiance. Camera/specular rays take it unweighted; with
        # path-vertex reuse, non-specular continuations take it MIS-weighted
        # against the light strategy's env pdf (the reused BSDF branch of
        # EstimateDirect part 2)
        if path_reuse and lt.INFINITE in meta.light_types:
            w_env = jnp.where(spec_bounce, 1.0, mc.power_heuristic(
                1.0, pdf_prev, 1.0,
                lt.env_pdf(scene, scene["env_row"] * jnp.ones((n,), jnp.int32),
                           d)))
            L += jnp.where((active & miss)[..., None],
                           throughput * w_env[..., None]
                           * lt.escaped_radiance(scene, d, meta.light_types),
                           0.0)
        else:
            L += jnp.where((active & miss & spec_bounce)[..., None],
                           throughput
                           * lt.escaped_radiance(scene, d, meta.light_types),
                           0.0)
        active = active & ~miss

        # camdiff is only passed to the peeled bounce-0 body; later bounces
        # carry no ray differentials (pbrt: RayDifferentials exist on camera
        # rays only) and take the cheap finest-level bilinear texture path
        if use_mb:
            sg = _shade_geom(scene, meta, hit, o, d, camdiff=camdiff,
                             is_primary=first, time=time)
            wo_local = geom.world_to_local(sg, -d)
            lobes = None
        else:
            sg, lobes, wo_local = _shade_context(scene, meta, hit, o, d,
                                                 camdiff=camdiff,
                                                 is_primary=first, time=time)

        # emitted at hit (area lights): camera/specular vertices unweighted;
        # with path-vertex reuse, other vertices MIS-weighted by the light
        # strategy's per-point solid-angle pdf at this hit
        if lt.AREA in meta.light_types:
            if path_reuse:
                cos_at = dot(sg["ng"], -d)
                lp = lt.area_light_pdf_dir(scene, jnp.maximum(sg["light"], 0),
                                           o, d, hit["t"], cos_at)
                on_light = sg["light"] >= 0
                w_em = jnp.where(spec_bounce | ~on_light, 1.0,
                                 mc.power_heuristic(1.0, pdf_prev, 1.0, lp))
                L += jnp.where(active[..., None],
                               throughput * w_em[..., None]
                               * lt.area_light_emitted(scene, sg, -d), 0.0)
            else:
                L += jnp.where((active & spec_bounce)[..., None],
                               throughput
                               * lt.area_light_emitted(scene, sg, -d), 0.0)

        # ---- instant GI: VPL gather (igi.cpp Li indirect term)
        if vpls is not None:
            from .igi import vpl_radiance
            Lv_igi = vpl_radiance(scene, meta, cfg, sg, lobes, wo_local, vpls,
                                  active)
            L += jnp.where(active[..., None], throughput * Lv_igi, 0.0)

        # ---- material-sorted megabatch pass: ONE sorted visit computes the
        # light-branch f/pdf, the continuation sample, and the reuse-MIS
        # partner pdf for the whole wave (same RNG dims as the unsorted path;
        # counter-based draws make the order immaterial)
        if use_mb:
            u_dir = rngmod.sample_2d(meta.sampler, pix, samp,
                                     _bdim(bounce, _D_BSDF_DIR))
            u_comp = rngmod.sample_1d(meta.sampler, pix, samp,
                                      _bdim(bounce, _D_BSDF_COMP))
            if meta.n_lights > 0:
                lidx, pmf = _pick_light(scene, meta, cfg, pix, samp, bounce,
                                        active)
                u2d_l = rngmod.sample_2d(meta.sampler, pix, samp,
                                         _bdim(bounce, _D_LIGHT_POS))
                u_tri_l = rngmod.sample_1d(meta.sampler, pix, samp,
                                           _bdim(bounce, _D_LIGHT_TRI))
                ls_mb = lt.sample_li(scene, lidx, sg["p"], u2d_l[0], u2d_l[1],
                                     u_tri_l, meta.light_types,
                                     meta.light_image_rows)
                wi_l_mb = geom.world_to_local(sg, ls_mb["wi"])
            else:
                ls_mb = None
                wi_l_mb = wo_local
            from ..shade.megabatch import megabatch_shade
            mb = megabatch_shade(scene, meta, sg, wo_local, wi_l_mb,
                                 u_dir[0], u_dir[1], u_comp, active,
                                 block=cfg.mat_block)

        # ---- direct lighting
        if use_mb and meta.n_lights > 0:
            Ld = estimate_direct(scene, meta, sg, None, None, lidx, pmf,
                                 None, None, None, None, active, time=time,
                                 bsdf_branch=False,
                                 precomputed=(mb["f_l"], mb["pdf_l"]),
                                 ls=ls_mb)
            L += jnp.where(active[..., None], throughput * Ld, 0.0)
        elif meta.n_lights > 0 and cfg.kind != "whitted":
            if cfg.light_strategy == "all":
                Ld = jnp.zeros((n, 3), jnp.float32)
                for lrow in range(meta.n_lights):
                    lidx = jnp.full((n,), lrow, jnp.int32)
                    pmf = jnp.ones((n,), jnp.float32)
                    Ld += estimate_direct(
                        scene, meta, sg, lobes, wo_local, lidx, pmf,
                        (rngmod.sample_2d(meta.sampler, pix, samp,
                                          _bdim(bounce, _D_LIGHT_POS) + 100 * lrow)),
                        rngmod.sample_1d(meta.sampler, pix, samp,
                                         _bdim(bounce, _D_LIGHT_TRI) + 100 * lrow),
                        rngmod.sample_1d(meta.sampler, pix, samp,
                                         _bdim(bounce, _D_MIS_COMP) + 100 * lrow),
                        (rngmod.sample_2d(meta.sampler, pix, samp,
                                          _bdim(bounce, _D_MIS_DIR) + 100 * lrow)),
                        active, time=time)
            else:
                lidx, pmf = _pick_light(scene, meta, cfg, pix, samp, bounce, active)
                Ld = estimate_direct(
                    scene, meta, sg, lobes, wo_local, lidx, pmf,
                    rngmod.sample_2d(meta.sampler, pix, samp, _bdim(bounce, _D_LIGHT_POS)),
                    rngmod.sample_1d(meta.sampler, pix, samp, _bdim(bounce, _D_LIGHT_TRI)),
                    rngmod.sample_1d(meta.sampler, pix, samp, _bdim(bounce, _D_MIS_COMP)),
                    rngmod.sample_2d(meta.sampler, pix, samp, _bdim(bounce, _D_MIS_DIR)),
                    active, time=time, bsdf_branch=not path_reuse)
            L += jnp.where(active[..., None], throughput * Ld, 0.0)
        elif meta.n_lights > 0 and cfg.kind == "whitted":
            # whitted.cpp: sample every light once, no MIS
            Ld = jnp.zeros((n, 3), jnp.float32)
            for lrow in range(meta.n_lights):
                lidx = jnp.full((n,), lrow, jnp.int32)
                u2d = rngmod.sample_2d(meta.sampler, pix, samp,
                                       _bdim(bounce, _D_LIGHT_POS) + 100 * lrow)
                u3 = rngmod.sample_1d(meta.sampler, pix, samp,
                                      _bdim(bounce, _D_LIGHT_TRI) + 100 * lrow)
                ls = lt.sample_li(scene, lidx, sg["p"], u2d[0], u2d[1], u3,
                                  meta.light_types, meta.light_image_rows)
                wi_l = geom.world_to_local(sg, ls["wi"])
                f_l = bx.bsdf_f(lobes, wo_local, wi_l, meta.lobe_types, False,
                                tables=scene.get("brdf_tables", ()))
                cos_l = absdot(ls["wi"], sg["ns"])
                ok = active & (ls["pdf"] > 0.0) & (cos_l > 0.0)
                occl = scene_intersect_p(
                    scene, meta,
                    sg["p"] + ls["wi"] * sg["ray_eps"][..., None], ls["wi"],
                    jnp.where(ok, ls["dist"] - 2.0 * sg["ray_eps"], 0.0),
                    time=time)
                Ld += jnp.where((ok & ~occl)[..., None],
                                f_l * ls["radiance"]
                                * (cos_l / _detach(jnp.maximum(ls["pdf"], 1e-12)))[..., None],
                                0.0)
            L += jnp.where(active[..., None], throughput * Ld, 0.0)

        # ---- continuation: sample BSDF (a no-op for the final iteration: the
        # loop exits before the next intersect, so only dead state is written)
        if use_mb:
            bs = {"f": mb["f"], "pdf": mb["pdf"], "specular": mb["spec"],
                  "valid": mb["valid"]}
            wi_w = mb["wi_w"]
        else:
            u_dir = rngmod.sample_2d(meta.sampler, pix, samp,
                                     _bdim(bounce, _D_BSDF_DIR))
            u_comp = rngmod.sample_1d(meta.sampler, pix, samp,
                                      _bdim(bounce, _D_BSDF_COMP))
            bs = bx.bsdf_sample(lobes, wo_local, u_dir[0], u_dir[1], u_comp,
                                meta.lobe_types, include_specular=True,
                                tables=scene.get("brdf_tables", ()))
            wi_w = geom.local_to_world(sg, bs["wi"])
        cos_c = absdot(wi_w, sg["ns"])
        contrib = bs["f"] * (cos_c / _detach(jnp.maximum(bs["pdf"], 1e-12)))[..., None]
        cont_ok = bs["valid"] & jnp.any(bs["f"] != 0.0, axis=-1)
        if cfg.kind in ("direct", "whitted", "igi"):
            cont_ok = cont_ok & bs["specular"]   # only specular recursion
        throughput = jnp.where(cont_ok[..., None], throughput * contrib, throughput)
        active = active & cont_ok
        spec_bounce = bs["specular"]
        if path_reuse:
            # the light strategy's partner pdf for the next hit's emission:
            # the non-specular average pdf of THIS direction (the same
            # function EstimateDirect's light branch weighted against)
            pdf_prev = jnp.where(
                bs["specular"], 0.0,
                _detach(mb["pdf_prev_nospec"] if use_mb else
                        bx.bsdf_pdf(lobes, wo_local,
                                    geom.world_to_local(sg, wi_w),
                                    meta.lobe_types,
                                    include_specular=False)))

        # ---- Russian roulette (path.cpp: after rr_depth bounces)
        if cfg.kind == "path":
            q = jnp.where(bounce >= cfg.rr_depth,
                          jnp.minimum(0.5, luminance(_detach(throughput))),
                          1.0)
            u_rr = rngmod.sample_1d(meta.sampler, pix, samp, _bdim(bounce, _D_RR))
            survive = u_rr < q
            active = active & survive
            throughput = throughput / _detach(jnp.maximum(q, 1e-6))[..., None]

        o = sg["p"] + wi_w * sg["ray_eps"][..., None]
        d = wi_w
        return (o, d, L, throughput, active, spec_bounce, pdf_prev)

    return bounce_body


def _compaction_take(active, cap):
    """Indices of the first `cap` active lanes, in lane order (stable
    compaction). One cumsum + a vectorized binary search — measured far
    cheaper on TPU than either a 1M-key sort (~140 ms) or a 1M-element
    scatter-built permutation (both cost more than the bounces they save).
    Entries past the live count are n (out of range; gather clips, scatter
    drops)."""
    n = active.shape[0]
    csum = jnp.cumsum(active.astype(jnp.int32))
    count = csum[-1]
    take = jnp.searchsorted(csum, jnp.arange(1, cap + 1, dtype=jnp.int32),
                            side="left").astype(jnp.int32)
    return take, count


def li(scene, meta, cfg: IntegratorConfig, rays, pix, samp, with_stats=False):
    """Radiance for a batch of camera rays — the wavefront bounce loop.

    rays: dict from camera.generate_rays; pix, samp: sampler coordinates.
    Returns L (N,3); with_stats=True returns (L, occ) where occ[b] = number of
    lanes active entering bounce b (the wavefront occupancy signal, SURVEY
    §5.1 — pbrt's PBRT_* ray-counter probes analog).
    """
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    # Derive the loop-carry seeds from the (possibly device-varying) ray
    # arrays rather than fresh constants: under shard_map the fori_loop carry
    # must enter with the same varying-axis type it exits with.
    zero3 = o * 0.0
    L = zero3
    throughput = zero3 + 1.0
    z0 = zero3[:, 0]
    active = (z0 == 0.0) | (z0 != 0.0)         # all True (even NaN lanes), varying like o
    spec_bounce = active                       # bounce-0 emission counts
    pdf_prev = z0 + 1.0                        # camera "pdf" (unused at b0)

    if cfg.kind == "ao":
        return _ao_li(scene, meta, cfg, rays, pix, samp)
    if cfg.kind not in ("path", "direct", "whitted", "igi"):
        raise ValueError(f"unknown integrator kind {cfg.kind!r}; "
                         "expected path|direct|whitted|ao|igi")

    vpls = None
    if cfg.kind == "igi":
        from .igi import generate_vpls
        # VPL set rotates with the wave index (igi.cpp picks a set per sample)
        vpls = generate_vpls(scene, meta, cfg, samp[0] % cfg.igi_n_sets)

    has_media = scene.get("media") is not None
    max_depth = cfg.max_depth
    time = rays.get("time")
    # bounce 0 is PEELED out of the fori_loop with a concrete bounce index:
    # camera differentials (the mip/EWA texture path) exist only there, the
    # camera closest-hit skips ray re-binning (already tile-ordered), and
    # bounces >= 1 compile without any of the masked differential machinery
    # (previously EWA ran — masked to width 0 — at EVERY bounce)
    body0 = _make_bounce_body(scene, meta, cfg, pix, samp,
                              rays.get("camdiff"), n, vpls, has_media,
                              time=time)
    body = _make_bounce_body(scene, meta, cfg, pix, samp, None,
                             n, vpls, has_media, time=time)
    state = (o, d, L, throughput, active, spec_bounce, pdf_prev)

    occ = jnp.zeros((max_depth + 1,), jnp.float32) if with_stats else None

    def body_occ(b, carry):
        st, oc = carry
        oc = oc.at[b].set(jnp.sum(st[4].astype(jnp.float32)))
        return body(b, st), oc

    if with_stats:
        occ = occ.at[0].set(jnp.sum(active.astype(jnp.float32)))
    state = body0(0, state)
    del body, body_occ   # the tail builds width-specific bodies

    # ---- multi-split wavefront compaction (SURVEY §2.10 P8, generalized).
    # The wavefront goes dark fast (mesh scene occupancy entering bounces:
    # 1.0, 0.62, 0.19, 0.08, ...), so the tail repacks survivors at SEVERAL
    # static split points, each with an overflow guard: a wave whose live
    # count exceeds a split's capacity skips THAT split and retries the next
    # one (so a bright scene like the closed Cornell still compacts after
    # Russian roulette while the open mesh scene compacts from bounce 2).
    # Packing uses the stable take-list (cumsum+searchsorted); the estimator
    # is bitwise exact either way.
    k = min(cfg.rr_depth + 1, max_depth + 1)
    splits = []
    if cfg.compact and cfg.kind == "path" and n >= cfg.compact_min:
        # the pre-RR split only pays for OPEN scenes where the wavefront goes
        # dark before Russian roulette (mesh/env scenes, which also use the
        # stream BVH); closed interiors (Cornell: ~0.97 occupancy at bounce 2)
        # would always overflow it and pay the take-list for nothing
        if k > 2 and max_depth + 1 > 2 and isect._use_stream(scene):
            early = (int(n * min(0.5, 4.0 * cfg.compact_frac)) // 1024) * 1024
            if early >= 1024:
                splits.append((2, early))
        if k < max_depth + 1:
            cap = (int(n * cfg.compact_frac) // 1024) * 1024
            if cap >= 1024:
                splits.append((k, cap))

    def tail(st, oc, pix_t, samp_t, time_t, width, from_b, splits):
        bodyw = _make_bounce_body(scene, meta, cfg, pix_t, samp_t, None,
                                  width, vpls, has_media, time=time_t)

        def bodyw_occ(b, carry):
            s2, o2 = carry
            o2 = o2.at[b].set(jnp.sum(s2[4].astype(jnp.float32)))
            return bodyw(b, s2), o2

        def run(st, oc, b0, b1):
            if b0 >= b1:
                return st, oc
            if with_stats:
                return jax.lax.fori_loop(b0, b1, bodyw_occ, (st, oc))
            return jax.lax.fori_loop(b0, b1, bodyw, st), oc

        # next applicable split (capacity must shrink the width)
        while splits and (splits[0][0] < from_b or splits[0][1] >= width):
            splits = splits[1:]
        if not splits:
            st, oc = run(st, oc, from_b, max_depth + 1)
            return st[2], oc
        sb, cap = splits[0]
        st, oc = run(st, oc, from_b, sb)
        take, count = _compaction_take(st[4], cap)

        def fit(_):
            gidx = jnp.minimum(take, width - 1)
            live = jnp.arange(cap, dtype=jnp.int32) < count
            g = lambda a: a[gidx]
            sub = (g(st[0]), g(st[1]), g(st[2]), g(st[3]),
                   g(st[4]) & live, g(st[5]), g(st[6]))
            sub_t = None if time_t is None else time_t[gidx]
            subL, oc2 = tail(sub, oc, pix_t[gidx], samp_t[gidx], sub_t,
                             cap, sb, splits[1:])
            # dead take entries are index `width` → dropped by the scatter,
            # so a live lane aliased by the gather clip is never overwritten
            return st[2].at[take].set(subL, mode="drop"), oc2

        def over(_):
            return tail(st, oc, pix_t, samp_t, time_t, width, sb, splits[1:])

        return jax.lax.cond(count <= cap, fit, over, None)

    L, occ = tail(state, occ, pix, samp, time, n, 1, splits)
    if with_stats:
        return L * rays["weight"][..., None], occ
    return L * rays["weight"][..., None]


def _ao_li(scene, meta, cfg, rays, pix, samp):
    """ambientocclusion.cpp: fraction of cosine-sampled rays unoccluded."""
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    time = rays.get("time")
    hit = scene_intersect(scene, meta, o, d,
                          BIG * jnp.ones((n,), jnp.float32), time=time)
    sg = geom.shading_geometry(scene, hit, o, d, time=time)
    active = hit["prim"] >= 0
    total = jnp.zeros((n,), jnp.float32)
    for s in range(cfg.ao_samples):
        u = rngmod.sample_2d(meta.sampler, pix, samp, _BOUNCE_BASE + s)
        wl = mc.cosine_sample_hemisphere(u[0], u[1])
        w = geom.local_to_world(sg, wl)
        w = jnp.where(dot(w, sg["ng"])[..., None] < 0.0, -w, w)
        occ = scene_intersect_p(
            scene, meta, sg["p"] + w * sg["ray_eps"][..., None], w,
            jnp.full((n,), cfg.ao_maxdist, jnp.float32), time=time)
        total += jnp.where(active & ~occ, 1.0, 0.0)
    ao = total / cfg.ao_samples
    return ao[..., None] * jnp.ones((n, 3)) * rays["weight"][..., None]
