"""Light table + sampling — pbrt src/lights/* and src/core/light.{h,cpp} as SoA.

Types: POINT, SPOT, DISTANT, AREA (diffuse, over triangle sets), INFINITE (lat-long
env with 2D luminance·sinθ importance table), PROJECTION, GONIOMETRIC.
`sample_li` is the masked-dispatch analog of Light::Sample_L(p, ...); area lights
pick a triangle from a per-light area CDF then a uniform barycentric point, with the
area→solid-angle Jacobian exactly as Shape::Pdf (src/core/shape.cpp).

Area-light MIS note (deliberate divergence from ShapeSet::Pdf, src/core/light.cpp):
both MIS branches use the *per-point* solid-angle pdf r²/(|cosθ|·totalArea) — the
light branch at its sampled point, the BSDF branch at its first-hit point. This is
area-domain MIS: for every visible light point y both weights are computed from
the same pair (pdf_light(y), pdf_bsdf(y)), so they partition unity pointwise and
the estimator is unbiased for ARBITRARY (even self-overlapping) emitters —
verified against dense quadrature for a two-quad stacked emitter in
tests/test_lights.py. pbrt-v2 instead divides by the direction-summed
ShapeSet::Pdf while keeping sampled-point radiance/visibility, which
under-counts when an emitter's own triangles overlap along a direction; we keep
the unbiased form. area_light_pdf_dir_sum implements the reference's
direction-summed pdf for comparison/testing.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import (PI, TWO_PI, INV_PI, dot, normalize, length, length_sq,
                            cross, spherical_theta, spherical_phi,
                            spherical_direction)
from ..core import montecarlo as mc
from ..core import transform as tr

POINT = 0
SPOT = 1
DISTANT = 2
AREA = 3
INFINITE = 4
PROJECTION = 5
GONIOMETRIC = 6

WORLD_BIG = jnp.float32(1.0e7)


def is_delta(light_type):
    return (light_type == POINT) | (light_type == SPOT) | (light_type == DISTANT) \
        | (light_type == PROJECTION) | (light_type == GONIOMETRIC)


def _spot_falloff(lights, li, w_world):
    """pbrt spot.cpp SpotLight::Falloff: smooth delta^4 between cone angles."""
    wl = tr.xform_v(lights["w2l"][li], w_world)
    costheta = wl[..., 2] / jnp.maximum(length(wl), 1e-12)
    cos_total = lights["cos_total"][li]
    cos_fall = lights["cos_falloff"][li]
    delta = (costheta - cos_total) / jnp.maximum(cos_fall - cos_total, 1e-6)
    delta = jnp.clip(delta, 0.0, 1.0)
    return jnp.where(costheta < cos_total, 0.0,
                     jnp.where(costheta > cos_fall, 1.0, delta ** 4))


def _projection_factor(lights, li, w_world, images, light_image_rows):
    """pbrt projection.cpp: project local dir through the perspective screen."""
    if not light_image_rows:
        return jnp.ones(w_world.shape[:-1], jnp.float32)
    wl = tr.xform_v(lights["w2l"][li], w_world)
    # project onto z=1 plane through proj matrix stored per light
    proj = lights["proj"][li]                          # (...,4,4)
    behind = wl[..., 2] < lights["proj_hither"][li]
    pw = tr.xform_p(proj, wl)
    scr = lights["screen"]
    s0, s1 = scr[:, 0][li], scr[:, 1][li]
    t0, t1 = scr[:, 2][li], scr[:, 3][li]
    s = (pw[..., 0] - s0) / (s1 - s0)
    t = (pw[..., 1] - t0) / (t1 - t0)
    inside = (~behind) & (s >= 0) & (s <= 1) & (t >= 0) & (t <= 1)
    val = jnp.zeros(w_world.shape[:-1] + (3,), jnp.float32)
    from .textures import image_bilinear
    for row, img in light_image_rows.items():
        m = (lights["image_row"][li] == row)
        val = jnp.where(m[..., None], image_bilinear(images[img], s, t), val)
    return jnp.where(inside[..., None], val, 0.0)


def _gonio_factor(lights, li, w_world, images, light_image_rows):
    """pbrt goniometric.cpp: lat-long lookup of the local direction."""
    if not light_image_rows:
        return jnp.ones(w_world.shape[:-1] + (3,), jnp.float32)
    wl = normalize(tr.xform_v(lights["w2l"][li], w_world))
    s = spherical_phi(wl) / TWO_PI
    t = spherical_theta(wl) / PI
    from .textures import image_bilinear
    val = jnp.ones(w_world.shape[:-1] + (3,), jnp.float32)
    for row, img in light_image_rows.items():
        m = (lights["image_row"][li] == row)
        val = jnp.where(m[..., None], image_bilinear(images[img], s, t), val)
    return val


def _area_sample(scene, li, p, u1, u2, u3):
    """Sample a point on area light li: tri via area CDF, uniform barycentric.

    Returns (wi, li_radiance_mask_cos, pdf_solidangle, dist, n_l)."""
    lights = scene["lights"]
    # flat-gather row search: never materializes per-lane (N, AT+1) CDF rows
    tri_slot = mc.searchsorted_rows(lights["acdf"], li, u3)      # (N,)
    # pre-gathered light-triangle geometry (lights["av0"/"av1"/"av2"/"aflip"])
    # — identical values to gathering the mesh, but independent of the global
    # vertex arrays (P6 scene-sharded mode holds no full mesh on any device)
    at = lights["av0"].shape[1]
    flat = li * at + tri_slot
    v0 = lights["av0"].reshape(-1, 3)[flat]
    v1 = lights["av1"].reshape(-1, 3)[flat]
    v2 = lights["av2"].reshape(-1, 3)[flat]
    b0, b1 = mc.uniform_sample_triangle(u1, u2)
    pl = b0[..., None] * v0 + b1[..., None] * v1 + (1.0 - b0 - b1)[..., None] * v2
    n_l = normalize(cross(v1 - v0, v2 - v0))
    flip = lights["aflip"].reshape(-1)[flat] != 0
    n_l = jnp.where(flip[..., None], -n_l, n_l)

    vec = pl - p
    dist2 = length_sq(vec)
    dist = jnp.sqrt(jnp.maximum(dist2, 1e-20))
    wi = vec / dist[..., None]
    cos_l = dot(n_l, -wi)
    # per-point area pdf → solid angle (Shape::Pdf conversion); see module
    # docstring for why this per-point form (not ShapeSet::Pdf's direction
    # sum) is the one that stays unbiased for overlapping emitters
    pdf = dist2 / jnp.maximum(jnp.abs(cos_l) * lights["area"][li], 1e-12)
    return wi, n_l, cos_l, pdf, dist


def sample_li(scene, li, p, u1, u2, u3, present_types, light_image_rows=()):
    """Light::Sample_L(p) masked over light types.

    li (N,) light row per shade point; u1,u2 2D sample; u3 extra (area tri pick).
    light_image_rows: static ((light_row, image_id), ...) from
    SceneMeta.light_image_rows — the projection/goniometric light maps.
    Returns dict: wi (N,3), radiance (N,3), pdf (N,), dist (N,) (shadow ray length;
    WORLD_BIG for infinite/distant), delta (N,) bool.
    """
    image_rows = dict(light_image_rows)
    lights = scene["lights"]
    lt = lights["type"][li]
    n = p.shape[0]
    wi = jnp.zeros((n, 3), jnp.float32)
    radiance = jnp.zeros((n, 3), jnp.float32)
    pdf = jnp.zeros((n,), jnp.float32)
    dist = jnp.full((n,), WORLD_BIG, jnp.float32)

    def put(mask, wi_c, rad_c, pdf_c, dist_c):
        nonlocal wi, radiance, pdf, dist
        wi = jnp.where(mask[..., None], wi_c, wi)
        radiance = jnp.where(mask[..., None], rad_c, radiance)
        pdf = jnp.where(mask, pdf_c, pdf)
        dist = jnp.where(mask, dist_c, dist)

    emit = lights["emit"][li]
    # slice-then-gather: `l2w[li, :3, 3]` (advanced+basic mix) hits a ~1000x
    # slower XLA:TPU gather path than gathering from the pre-sliced table
    lpos = lights["l2w"][:, :3, 3][li]

    if (POINT in present_types) or (SPOT in present_types) \
            or (PROJECTION in present_types) or (GONIOMETRIC in present_types):
        vec = lpos - p
        d2 = jnp.maximum(length_sq(vec), 1e-20)
        dd = jnp.sqrt(d2)
        wi_p = vec / dd[..., None]
        base = emit / d2[..., None]
        if POINT in present_types:
            put(lt == POINT, wi_p, base, jnp.ones_like(pdf), dd)
        if SPOT in present_types:
            fall = _spot_falloff(lights, li, -wi_p)
            put(lt == SPOT, wi_p, base * fall[..., None], jnp.ones_like(pdf), dd)
        if PROJECTION in present_types:
            proj = _projection_factor(lights, li, -wi_p,
                                      scene.get("images", ()), image_rows)
            put(lt == PROJECTION, wi_p, base * proj, jnp.ones_like(pdf), dd)
        if GONIOMETRIC in present_types:
            gon = _gonio_factor(lights, li, -wi_p,
                                scene.get("images", ()), image_rows)
            put(lt == GONIOMETRIC, wi_p, base * gon, jnp.ones_like(pdf), dd)

    if DISTANT in present_types:
        wdir = lights["world_dir"][li]                # direction TO the light
        put(lt == DISTANT, wdir, emit, jnp.ones_like(pdf), dist)

    if AREA in present_types:
        wi_a, n_l, cos_l, pdf_a, dist_a = _area_sample(scene, li, p, u1, u2, u3)
        rad_a = jnp.where((cos_l > 0.0)[..., None], emit, 0.0)
        put(lt == AREA, wi_a, rad_a, pdf_a, dist_a * (1.0 - 1e-3))

    if INFINITE in present_types:
        u, v, map_pdf = mc.sample_distribution_2d(scene["env_dist"], u1, u2)
        theta = v * PI
        phi = u * TWO_PI
        sintheta = jnp.sin(theta)
        wl = spherical_direction(sintheta, jnp.cos(theta), phi)
        wi_e = tr.xform_v(lights["l2w"][li], wl)
        pdf_e = map_pdf / jnp.maximum(2.0 * PI * PI * sintheta, 1e-9)
        rad_e = env_radiance(scene, li, wi_e)
        put(lt == INFINITE, wi_e, rad_e, pdf_e, dist)

    return {"wi": wi, "radiance": radiance, "pdf": pdf, "dist": dist,
            "delta": is_delta(lt)}


def env_radiance(scene, li, w_world):
    """InfiniteAreaLight::Le for direction(s) — lat-long map lookup."""
    lights = scene["lights"]
    wl = normalize(tr.xform_v(lights["w2l"][li], w_world))
    s = spherical_phi(wl) / TWO_PI
    t = spherical_theta(wl) / PI
    emit = lights["emit"][li]
    if scene.get("env_map") is None:
        return emit
    from .textures import image_bilinear
    return emit * image_bilinear(scene["env_map"], s, t)


def escaped_radiance(scene, d, present_types):
    """Σ lights Le(ray) for escaped rays (pbrt Light::Le, infinite.cpp)."""
    n = d.shape[0]
    out = jnp.zeros((n, 3), jnp.float32)
    if INFINITE not in present_types:
        return out
    li = scene["env_row"] * jnp.ones((n,), jnp.int32)
    return env_radiance(scene, li, d)


def env_pdf(scene, li, w_world):
    """InfiniteAreaLight::Pdf(p, wi): map pdf with inverse lat-long Jacobian."""
    lights = scene["lights"]
    wl = normalize(tr.xform_v(lights["w2l"][li], w_world))
    theta = spherical_theta(wl)
    phi = spherical_phi(wl)
    sintheta = jnp.maximum(jnp.sin(theta), 1e-6)
    p2 = mc.distribution_2d_pdf(scene["env_dist"], phi / TWO_PI, theta / PI)
    return p2 / (2.0 * PI * PI * sintheta)


def area_light_emitted(scene, sg, wo_world):
    """Intersection::Le — emitted radiance at a hit on an area-light triangle
    (pbrt diffuse.cpp DiffuseAreaLight::L: Lemit if dot(n, w) > 0)."""
    lights = scene["lights"]
    li = jnp.maximum(sg["light"], 0)
    emit = lights["emit"][li]
    facing = dot(sg["ng"], wo_world) > 0.0
    mask = (sg["light"] >= 0) & facing
    return jnp.where(mask[..., None], emit, 0.0)


def area_light_pdf_dir(scene, li, p, wi, hit_t, cos_at_light):
    """Per-point solid-angle pdf at the BSDF branch's first-hit light point:
    r²/(|cosθ|·totalArea) — the same per-point function the light branch
    divides by (area-domain MIS; see module docstring)."""
    lights = scene["lights"]
    return (hit_t * hit_t) / jnp.maximum(
        jnp.abs(cos_at_light) * lights["area"][li], 1e-12)


AREA_PDF_EXACT_MAX = 16


def area_light_pdf_dir_sum(scene, li, p, wi):
    """The reference's ShapeSet::Pdf(p, wi) (src/core/light.cpp): Σ over the
    light's triangles of area_i/total · Shape::Pdf_i(p, wi)
    = Σ_hit dist_i²/(|cosθ_i|·totalArea). Implemented for parity/testing
    (static unrolled masked Möller-Trumbore over the light's padded triangle
    row, lights up to AREA_PDF_EXACT_MAX triangles); the render path uses the
    per-point form above instead — see module docstring."""
    lights = scene["lights"]
    total = lights["area"][li]
    at = lights["atri"].shape[1]
    assert at <= AREA_PDF_EXACT_MAX, "direction-summed pdf for small sets only"
    from ..kernels.intersect import moller_trumbore
    pdf = jnp.zeros(li.shape, jnp.float32)
    kvec = jnp.zeros_like(li)
    for k in range(at):
        tri = mc.gather_rows(lights["atri"], li, kvec + k)
        # padding slots have a flat CDF segment (zero area mass)
        valid = (mc.gather_rows(lights["acdf"], li, kvec + k + 1)
                 > mc.gather_rows(lights["acdf"], li, kvec + k))
        idx = scene["tri_idx"][tri]
        v0 = scene["verts"][idx[..., 0]]
        e1 = scene["verts"][idx[..., 1]] - v0
        e2 = scene["verts"][idx[..., 2]] - v0
        hit, t, _, _ = moller_trumbore(
            p, wi, v0, e1, e2,
            jnp.full(li.shape, 1e-3, jnp.float32),
            jnp.full(li.shape, WORLD_BIG, jnp.float32))
        cos_k = dot(normalize(cross(e1, e2)), -wi)
        pdf = pdf + jnp.where(
            hit & valid,
            t * t / jnp.maximum(jnp.abs(cos_k) * total, 1e-12), 0.0)
    return pdf


def light_power(scene, static_meta=None):
    """Approximate emitted power per light (pbrt Light::Power analogs) — drives the
    power-weighted light-sampling distribution (ComputeLightSamplingCDF)."""
    lights = scene["lights"]
    from ..core.spectrum import luminance
    lt = lights["type"]
    emit_y = luminance(lights["emit"])
    world_r = scene.get("world_radius", jnp.float32(100.0))
    p_point = 4.0 * PI * emit_y
    cos_total = lights.get("cos_total", jnp.zeros_like(emit_y))
    cos_fall = lights.get("cos_falloff", jnp.zeros_like(emit_y))
    p_spot = emit_y * 2.0 * PI * (1.0 - 0.5 * (cos_fall + cos_total))
    p_dist = emit_y * PI * world_r * world_r
    p_area = emit_y * lights["area"] * PI
    p_inf = emit_y * PI * world_r * world_r
    power = jnp.where(lt == POINT, p_point,
            jnp.where(lt == SPOT, p_spot,
            jnp.where(lt == DISTANT, p_dist,
            jnp.where(lt == AREA, p_area,
            jnp.where(lt == INFINITE, p_inf, p_point)))))
    return jnp.maximum(power, 1e-9)
