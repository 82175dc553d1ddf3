"""BSDF lobe library — the jnp analog of pbrt src/core/reflection.{h,cpp}.

A BSDF is a static-length stack of lobes; each lobe has a type tag, an RGB weight
and a few scalar params (all evaluated from textures upstream). Everything works in
the local shading frame: z-up, CosTheta(w)=w.z, same conventions as the reference.
Instead of virtual dispatch, `f`/`sample`/`pdf` evaluate every lobe type present in
the scene (static set) under masks — the TPU megabatch analog of BxDF::f.

Lobe types (≈ pbrt classes):
  LAMBERT        LambertianReflection (reflection.h)
  OREN_NAYAR     OrenNayar
  BLINN          Microfacet + Blinn distribution + Fresnel (dielectric/conductor/noop)
  ANISO          Microfacet + Anisotropic (Ashikhmin-Shirley) distribution
  SPEC_REFL      SpecularReflection (delta)
  SPEC_TRANS     SpecularTransmission (delta)
  FRESNEL_BLEND  FresnelBlend (Ashikhmin-Shirley coupled diffuse+glossy)
  LAMBERT_T      BRDFToBTDF(Lambertian) — translucent transmission side
  BLINN_T        BRDFToBTDF(Microfacet)
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import PI, INV_PI, INV_TWOPI, dot, normalize
from ..core import montecarlo as mc

# lobe type tags
NONE = 0
LAMBERT = 1
OREN_NAYAR = 2
BLINN = 3
ANISO = 4
SPEC_REFL = 5
SPEC_TRANS = 6
FRESNEL_BLEND = 7
LAMBERT_T = 8
BLINN_T = 9
MEASURED = 10     # half-angle table lookup (measured.py); cosine-sampled

# fresnel type tags
FR_NOOP = 0
FR_DIELECTRIC = 1
FR_CONDUCTOR = 2

SPECULAR_TYPES = (SPEC_REFL, SPEC_TRANS)
TRANSMISSIVE_TYPES = (SPEC_TRANS, LAMBERT_T, BLINN_T)


def cos_theta(w):
    return w[..., 2]


def abs_cos_theta(w):
    return jnp.abs(w[..., 2])


def same_hemisphere(w, wp):
    return w[..., 2] * wp[..., 2] > 0.0


# ------------------------------------------------------------------------- Fresnel
def fr_dielectric(cosi, eta_i, eta_t):
    """Exact dielectric Fresnel with TIR (pbrt reflection.cpp FrDiel/Evaluate).

    cosi signed; swaps indices when exiting. Returns scalar reflectance."""
    cosi = jnp.clip(cosi, -1.0, 1.0)
    entering = cosi > 0.0
    ei = jnp.where(entering, eta_i, eta_t)
    et = jnp.where(entering, eta_t, eta_i)
    sint = ei / et * jnp.sqrt(jnp.maximum(0.0, 1.0 - cosi * cosi))
    tir = sint >= 1.0
    cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint * sint))
    aci = jnp.abs(cosi)
    rparl = (et * aci - ei * cost) / jnp.maximum(et * aci + ei * cost, 1e-12)
    rperp = (ei * aci - et * cost) / jnp.maximum(ei * aci + et * cost, 1e-12)
    fr = 0.5 * (rparl * rparl + rperp * rperp)
    return jnp.where(tir, 1.0, fr)


def fr_conductor(cosi, eta, k):
    """Conductor Fresnel (pbrt FrCond); eta,k RGB (...,3), cosi (...)."""
    cosi = jnp.abs(cosi)[..., None]
    tmp = (eta * eta + k * k) * cosi * cosi
    rparl2 = (tmp - 2.0 * eta * cosi + 1.0) / jnp.maximum(tmp + 2.0 * eta * cosi + 1.0, 1e-12)
    tmp_f = eta * eta + k * k
    rperp2 = (tmp_f - 2.0 * eta * cosi + cosi * cosi) / jnp.maximum(
        tmp_f + 2.0 * eta * cosi + cosi * cosi, 1e-12)
    return (rparl2 + rperp2) / 2.0


def schlick_fresnel(rs, costheta):
    """Schlick approximation used by FresnelBlend (reflection.h SchlickFresnel)."""
    c = jnp.clip(1.0 - costheta, 0.0, 1.0)
    return rs + (c ** 5)[..., None] * (1.0 - rs)


def lobe_fresnel(fr_type, cosi, eta_f, eta_s, k_s):
    """Masked dispatch over fresnel type: returns RGB reflectance (...,3)."""
    f_diel = fr_dielectric(cosi, 1.0, eta_f)[..., None] * jnp.ones(3)
    f_cond = fr_conductor(cosi, eta_s, k_s)
    one = jnp.ones(cosi.shape + (3,), jnp.float32)
    return jnp.where((fr_type == FR_DIELECTRIC)[..., None], f_diel,
                     jnp.where((fr_type == FR_CONDUCTOR)[..., None], f_cond, one))


# ------------------------------------------------------------------- microfacet dists
def blinn_d(wh, exponent):
    return (exponent + 2.0) * INV_TWOPI * jnp.power(
        jnp.maximum(abs_cos_theta(wh), 1e-6), exponent)


def blinn_sample_wh(wo, u1, u2, exponent):
    """Sample half vector ∝ Blinn D (pbrt Blinn::Sample_f)."""
    costheta = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (exponent + 1.0))
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = u2 * 2.0 * PI
    wh = jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1)
    return jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)


def blinn_pdf_wh_to_wi(wo, wh, exponent):
    """pdf of wi for Blinn sampling (includes dwh/dwi Jacobian)."""
    costheta = abs_cos_theta(wh)
    pdf_wh = (exponent + 1.0) * jnp.power(jnp.maximum(costheta, 1e-6), exponent) * INV_TWOPI
    dotp = jnp.maximum(jnp.abs(dot(wo, wh)), 1e-6)
    return pdf_wh / (4.0 * dotp)


def aniso_d(wh, ex, ey):
    ct = abs_cos_theta(wh)
    d = jnp.maximum(0.0, 1.0 - ct * ct)
    d_safe = jnp.where(d == 0.0, 1.0, d)
    e = (ex * wh[..., 0] * wh[..., 0] + ey * wh[..., 1] * wh[..., 1]) / d_safe
    val = jnp.sqrt((ex + 2.0) * (ey + 2.0)) * INV_TWOPI * jnp.power(
        jnp.maximum(ct, 1e-6), e)
    return jnp.where(d == 0.0, 0.0, val)


def _aniso_sample_first_quadrant(u1, u2, ex, ey):
    phi = jnp.arctan(jnp.sqrt((ex + 1.0) / (ey + 1.0)) * jnp.tan(PI * u1 * 0.5))
    cosphi, sinphi = jnp.cos(phi), jnp.sin(phi)
    costheta = jnp.power(jnp.maximum(u2, 1e-12), 1.0 / (
        ex * cosphi * cosphi + ey * sinphi * sinphi + 1.0))
    return phi, costheta


def aniso_sample_wh(wo, u1, u2, ex, ey):
    """Quadrant-aware Ashikhmin-Shirley sampling (pbrt Anisotropic::Sample_f)."""
    q = jnp.floor(u1 * 4.0)
    u1r = u1 * 4.0 - q
    phi_q, costheta = _aniso_sample_first_quadrant(u1r, u2, ex, ey)
    phi = jnp.where(q == 0, phi_q,
          jnp.where(q == 1, PI - phi_q,
          jnp.where(q == 2, PI + phi_q, 2.0 * PI - phi_q)))
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    wh = jnp.stack([sintheta * jnp.cos(phi), sintheta * jnp.sin(phi), costheta], axis=-1)
    return jnp.where(same_hemisphere(wo, wh)[..., None], wh, -wh)


def aniso_pdf_wh_to_wi(wo, wh, ex, ey):
    dotp = jnp.maximum(jnp.abs(dot(wo, wh)), 1e-6)
    return aniso_d(wh, ex, ey) / (4.0 * dotp)


def torrance_sparrow_g(wo, wi, wh):
    ndotwh = abs_cos_theta(wh)
    ndotwo = abs_cos_theta(wo)
    ndotwi = abs_cos_theta(wi)
    wodotwh = jnp.maximum(jnp.abs(dot(wo, wh)), 1e-6)
    return jnp.minimum(1.0, jnp.minimum(2.0 * ndotwh * ndotwo / wodotwh,
                                        2.0 * ndotwh * ndotwi / wodotwh))


# --------------------------------------------------------------------- lobe eval: f
def lobe_f(lobe_type, wo, wi, R, S1, S2, f0, f1, f2, fr_type, present=None,
           tables=()):
    """Evaluate one lobe slot's BRDF value for all shade points (masked by type).

    Args (batched over shade points):
      lobe_type (N,) int; wo, wi (N,3) local frame; R (N,3) main spectrum (e.g. Kd/Ks);
      S1, S2 (N,3) aux spectra (Rs / conductor eta / k); f0,f1,f2 (N,) scalars
      (roughness-exponent / 2nd exponent / ior); fr_type (N,) fresnel tag.
      tables: static tuple of measured half-angle BRDF tables (f1 = table id).
    Delta lobes return 0 here (handled in sampling only), as in pbrt.
    """
    if present is None:
        present = (LAMBERT, OREN_NAYAR, BLINN, ANISO, FRESNEL_BLEND, LAMBERT_T, BLINN_T)
    n = wo.shape[0]
    result = jnp.zeros((n, 3), jnp.float32)
    reflect = same_hemisphere(wo, wi)
    aci, aco = abs_cos_theta(wi), abs_cos_theta(wo)

    def where_type(t, val, cond=None):
        m = lobe_type == t
        if cond is not None:
            m = m & cond
        return jnp.where(m[..., None], val, 0.0)

    # Lambertian: R/pi (reflection side)
    if LAMBERT in present:
        result += where_type(LAMBERT, R * INV_PI, reflect)
    # Measured half-angle table (reflection.cpp RegularHalfangle/IrregIso)
    if MEASURED in present:
        if tables:
            from .measured import lookup as _measured_lookup
            mv = R * _measured_lookup(tables, f1.astype(jnp.int32), wo,
                                      jnp.where(reflect[..., None], wi, -wi))
        else:
            # caller without table plumbing: matte fallback with the baked
            # albedo estimate riding in S1
            mv = S1 * INV_PI
        result += where_type(MEASURED, mv, reflect)
    if LAMBERT_T in present:
        result += where_type(LAMBERT_T, R * INV_PI, ~reflect)

    # Oren-Nayar: A,B computed from sigma (degrees→radians done at build; f0=sigma rad)
    if OREN_NAYAR in present:
        sigma2 = f0 * f0
        A = 1.0 - sigma2 / (2.0 * (sigma2 + 0.33))
        B = 0.45 * sigma2 / (sigma2 + 0.09)
        sinthetai = jnp.sqrt(jnp.maximum(0.0, 1.0 - wi[..., 2] ** 2))
        sinthetao = jnp.sqrt(jnp.maximum(0.0, 1.0 - wo[..., 2] ** 2))
        # max(0, cos(phi_i - phi_o)) via normalized xy projections
        denom_i = jnp.where(sinthetai > 1e-4, sinthetai, 1.0)
        denom_o = jnp.where(sinthetao > 1e-4, sinthetao, 1.0)
        cosdphi = (wi[..., 0] * wo[..., 0] + wi[..., 1] * wo[..., 1]) / (denom_i * denom_o)
        maxcos = jnp.where((sinthetai > 1e-4) & (sinthetao > 1e-4),
                           jnp.maximum(0.0, cosdphi), 0.0)
        sinalpha = jnp.maximum(sinthetai, sinthetao)
        tanbeta = jnp.minimum(sinthetai, sinthetao) / jnp.maximum(
            jnp.minimum(aci, aco), 1e-6)
        on = R * INV_PI * (A + B * maxcos * sinalpha * tanbeta)[..., None]
        result += where_type(OREN_NAYAR, on, reflect)

    # Torrance-Sparrow microfacet (Blinn / Aniso), fresnel from fr_type
    if (BLINN in present) or (ANISO in present) or (FRESNEL_BLEND in present):
        wh = normalize(wi + wo)
        wh_ok = jnp.sum(jnp.abs(wi + wo), axis=-1) > 1e-9
        cosh = dot(wi, wh)
        denom = jnp.maximum(4.0 * aci * aco, 1e-6)
        micro_ok = reflect & wh_ok & (aci > 1e-6) & (aco > 1e-6)
        if (BLINN in present) or (ANISO in present):
            F = lobe_fresnel(fr_type, cosh, f2, S1, S2)
            G = torrance_sparrow_g(wo, wi, wh)
        if BLINN in present:
            ts_blinn = R * F * (blinn_d(wh, f0) * G / denom)[..., None]
            result += where_type(BLINN, ts_blinn, micro_ok)
        if ANISO in present:
            ts_aniso = R * F * (aniso_d(wh, f0, f1) * G / denom)[..., None]
            result += where_type(ANISO, ts_aniso, micro_ok)
        if FRESNEL_BLEND in present:
            # FresnelBlend (Ashikhmin-Shirley): coupled diffuse + glossy terms
            Rd, Rs = R, S1
            diffuse = (28.0 / (23.0 * PI)) * Rd * (1.0 - Rs) * (
                (1.0 - (1.0 - 0.5 * aci) ** 5) * (1.0 - (1.0 - 0.5 * aco) ** 5))[..., None]
            spec_denom = jnp.maximum(4.0 * jnp.abs(cosh) * jnp.maximum(aci, aco), 1e-6)
            specular = (aniso_d(wh, f0, f1) / spec_denom)[..., None] * schlick_fresnel(Rs, cosh)
            result += where_type(FRESNEL_BLEND, diffuse + specular, micro_ok)

    # BLINN_T: BRDFToBTDF(Microfacet) — evaluate the BRDF at wi mirrored into wo's
    # hemisphere (pbrt reflection.h BRDFToBTDF::otherHemisphere)
    if BLINN_T in present:
        wi_m = wi * jnp.array([1.0, 1.0, -1.0])
        wh_t = normalize(wi_m + wo)
        wh_t_ok = jnp.sum(jnp.abs(wi_m + wo), axis=-1) > 1e-9
        cosh_t = dot(wi_m, wh_t)
        F_t = lobe_fresnel(fr_type, cosh_t, f2, S1, S2)
        G_t = torrance_sparrow_g(wo, wi_m, wh_t)
        denom_t = jnp.maximum(4.0 * aci * aco, 1e-6)
        ts_blinn_t = R * F_t * (blinn_d(wh_t, f0) * G_t / denom_t)[..., None]
        result += where_type(BLINN_T, ts_blinn_t,
                             (~reflect) & wh_t_ok & (aci > 1e-6) & (aco > 1e-6))

    return result

# ------------------------------------------------------------------- lobe eval: pdf
def lobe_pdf(lobe_type, wo, wi, f0, f1, present=None):
    """pdf of one lobe slot's sampling strategy (0 for delta lobes, as pbrt)."""
    if present is None:
        present = (LAMBERT, OREN_NAYAR, BLINN, ANISO, FRESNEL_BLEND, LAMBERT_T, BLINN_T)
    reflect = same_hemisphere(wo, wi)
    aci = abs_cos_theta(wi)
    pdf = jnp.zeros(wo.shape[:-1], jnp.float32)

    def where_type(t, val, cond):
        return jnp.where((lobe_type == t) & cond, val, 0.0)

    cos_pdf = aci * INV_PI
    if LAMBERT in present:
        pdf += where_type(LAMBERT, cos_pdf, reflect)
    if MEASURED in present:
        pdf += where_type(MEASURED, cos_pdf, reflect)
    if OREN_NAYAR in present:
        pdf += where_type(OREN_NAYAR, cos_pdf, reflect)
    if LAMBERT_T in present:
        pdf += where_type(LAMBERT_T, cos_pdf, ~reflect)

    if (BLINN in present) or (ANISO in present) or (FRESNEL_BLEND in present):
        wh = normalize(wi + wo)
        wh_ok = jnp.sum(jnp.abs(wi + wo), axis=-1) > 1e-9
        if BLINN in present:
            pdf += where_type(BLINN, blinn_pdf_wh_to_wi(wo, wh, f0), reflect & wh_ok)
        if ANISO in present:
            pdf += where_type(ANISO, aniso_pdf_wh_to_wi(wo, wh, f0, f1), reflect & wh_ok)
        if FRESNEL_BLEND in present:
            # pbrt FresnelBlend::Pdf = .5*(cosine pdf + dist pdf)
            fb = 0.5 * (cos_pdf + aniso_pdf_wh_to_wi(wo, wh, f0, f1))
            pdf += where_type(FRESNEL_BLEND, fb, reflect & wh_ok)
    if BLINN_T in present:
        wi_m = wi * jnp.array([1.0, 1.0, -1.0])
        wh_t = normalize(wi_m + wo)
        wh_t_ok = jnp.sum(jnp.abs(wi_m + wo), axis=-1) > 1e-9
        pdf += where_type(BLINN_T, blinn_pdf_wh_to_wi(wo, wh_t, f0), (~reflect) & wh_t_ok)
    return pdf


# ---------------------------------------------------------------- lobe eval: sample
def _reflect_about(wo, wh):
    return -wo + 2.0 * dot(wo, wh)[..., None] * wh


def lobe_sample_wi(lobe_type, wo, u1, u2, f0, f1, f2, present=None):
    """Sample an incident direction from one lobe slot's strategy.

    Returns (wi, is_valid). Delta lobes return their deterministic direction.
    SPEC_TRANS refracts about +z with ior f2 (pbrt SpecularTransmission::Sample_f).
    """
    if present is None:
        present = (LAMBERT, OREN_NAYAR, BLINN, ANISO, FRESNEL_BLEND, LAMBERT_T,
                   BLINN_T, SPEC_REFL, SPEC_TRANS)
    n3 = wo.shape[:-1] + (3,)
    wi = jnp.zeros(n3, jnp.float32)
    valid = jnp.zeros(wo.shape[:-1], jnp.bool_)
    entering_sign = jnp.where(cos_theta(wo) > 0.0, 1.0, -1.0)

    def put(t, cand, ok):
        nonlocal wi, valid
        m = lobe_type == t
        wi = jnp.where(m[..., None], cand, wi)
        valid = jnp.where(m, ok, valid)

    # cosine hemisphere (diffuse lobes), flipped into wo's hemisphere
    if (LAMBERT in present) or (OREN_NAYAR in present) or (LAMBERT_T in present) \
            or (FRESNEL_BLEND in present) or (MEASURED in present):
        wi_cos = mc.cosine_sample_hemisphere(u1, u2)
        wi_cos_refl = wi_cos * jnp.stack(
            [jnp.ones_like(entering_sign), jnp.ones_like(entering_sign), entering_sign], axis=-1)
        if LAMBERT in present:
            put(LAMBERT, wi_cos_refl, jnp.ones_like(valid))
        if OREN_NAYAR in present:
            put(OREN_NAYAR, wi_cos_refl, jnp.ones_like(valid))
        if MEASURED in present:
            put(MEASURED, wi_cos_refl, jnp.ones_like(valid))
        if LAMBERT_T in present:
            put(LAMBERT_T, -wi_cos_refl, jnp.ones_like(valid))

    if BLINN in present:
        wh = blinn_sample_wh(wo, u1, u2, f0)
        cand = _reflect_about(wo, wh)
        put(BLINN, cand, same_hemisphere(wo, cand))
    if ANISO in present:
        wh = aniso_sample_wh(wo, u1, u2, f0, f1)
        cand = _reflect_about(wo, wh)
        put(ANISO, cand, same_hemisphere(wo, cand))
    if FRESNEL_BLEND in present:
        # pbrt FresnelBlend::Sample_f: u1<.5 → cosine (remapped), else dist
        use_cos = u1 < 0.5
        u1r = jnp.where(use_cos, 2.0 * u1, 2.0 * (u1 - 0.5))
        wi_c = mc.cosine_sample_hemisphere(u1r, u2)
        wi_c = wi_c * jnp.stack(
            [jnp.ones_like(entering_sign), jnp.ones_like(entering_sign), entering_sign], axis=-1)
        wh = aniso_sample_wh(wo, u1r, u2, f0, f1)
        wi_g = _reflect_about(wo, wh)
        cand = jnp.where(use_cos[..., None], wi_c, wi_g)
        put(FRESNEL_BLEND, cand, use_cos | same_hemisphere(wo, wi_g))
    if BLINN_T in present:
        wh = blinn_sample_wh(wo, u1, u2, f0)
        cand = _reflect_about(wo, wh)
        ok = same_hemisphere(wo, cand)
        put(BLINN_T, cand * jnp.array([1.0, 1.0, -1.0]), ok)
    if SPEC_REFL in present:
        cand = jnp.stack([-wo[..., 0], -wo[..., 1], wo[..., 2]], axis=-1)
        put(SPEC_REFL, cand, jnp.ones_like(valid))
    if SPEC_TRANS in present:
        # refract about z (pbrt SpecularTransmission::Sample_f)
        entering = cos_theta(wo) > 0.0
        ei = jnp.where(entering, 1.0, f2)
        et = jnp.where(entering, f2, 1.0)
        sini2 = jnp.maximum(0.0, 1.0 - cos_theta(wo) ** 2)
        eta = ei / et
        sint2 = eta * eta * sini2
        tir = sint2 >= 1.0
        cost = jnp.sqrt(jnp.maximum(0.0, 1.0 - sint2))
        cost = jnp.where(entering, -cost, cost)
        sint_over_sini = eta
        cand = jnp.stack([sint_over_sini * -wo[..., 0],
                          sint_over_sini * -wo[..., 1], cost], axis=-1)
        put(SPEC_TRANS, cand, ~tir)
    return wi, valid


def lobe_specular_value(lobe_type, wo, wi, R, S1, S2, f2, fr_type, present=None):
    """Delta-lobe f value as returned by pbrt's Sample_f: F·R/|cosθi| for reflection,
    (1−F)·T·(ei/et)²/|cosθi| for transmission. Zero for non-delta lobes."""
    if present is None:
        present = (SPEC_REFL, SPEC_TRANS)
    aci = jnp.maximum(abs_cos_theta(wi), 1e-6)
    out = jnp.zeros(wo.shape, jnp.float32)
    if SPEC_REFL in present:
        F = lobe_fresnel(fr_type, cos_theta(wo), f2, S1, S2)
        val = F * R / aci[..., None]
        out = jnp.where((lobe_type == SPEC_REFL)[..., None], val, out)
    if SPEC_TRANS in present:
        Fr = fr_dielectric(cos_theta(wo), 1.0, f2)
        entering = cos_theta(wo) > 0.0
        ei = jnp.where(entering, 1.0, f2)
        et = jnp.where(entering, f2, 1.0)
        # (ei/et)^2 radiance scaling (pbrt SpecularTransmission)
        val = ((ei * ei) / (et * et) * (1.0 - Fr))[..., None] * R / aci[..., None]
        out = jnp.where((lobe_type == SPEC_TRANS)[..., None], val, out)
    return out


# ------------------------------------------------------------------- BSDF stack API
def stack_present(lobes_static_types):
    """Static set of lobe types present (host-side list of ints)."""
    return tuple(sorted(set(int(t) for t in lobes_static_types) - {NONE}))


def _slot(lobes, k):
    return {key: lobes[key][:, k] for key in lobes}


def _matching_mask(lobes, include_specular):
    """(N,K) bool mask of lobes that match the requested flags."""
    t = lobes["type"]
    m = t != NONE
    if not include_specular:
        m = m & (t != SPEC_REFL) & (t != SPEC_TRANS)
    return m


def bsdf_num_components(lobes, include_specular=True):
    return jnp.sum(_matching_mask(lobes, include_specular).astype(jnp.int32), axis=-1)


def bsdf_f(lobes, wo, wi, present, include_specular=True, tables=()):
    """Σ over lobe slots of lobe_f — pbrt BSDF::f (sidedness handled per lobe)."""
    K = lobes["type"].shape[1]
    total = jnp.zeros(wo.shape, jnp.float32)
    for k in range(K):
        s = _slot(lobes, k)
        total += lobe_f(s["type"], wo, wi, s["R"], s["S1"], s["S2"],
                        s["f0"], s["f1"], s["f2"], s["fr"], present,
                        tables=tables)
    return total


def bsdf_pdf(lobes, wo, wi, present, include_specular=False):
    """Average pdf over matching lobes — pbrt BSDF::Pdf."""
    K = lobes["type"].shape[1]
    match = _matching_mask(lobes, include_specular)
    total = jnp.zeros(wo.shape[:-1], jnp.float32)
    for k in range(K):
        s = _slot(lobes, k)
        total += jnp.where(match[:, k],
                           lobe_pdf(s["type"], wo, wi, s["f0"], s["f1"], present), 0.0)
    n = jnp.sum(match.astype(jnp.float32), axis=-1)
    return jnp.where(n > 0, total / jnp.maximum(n, 1.0), 0.0)


def bsdf_sample(lobes, wo, u1, u2, u_comp, present, include_specular=True,
                tables=()):
    """pbrt BSDF::Sample_f over the lobe stack.

    Returns dict: wi (N,3), f (N,3), pdf (N,), specular (N,) bool, valid (N,) bool.
    For specular picks, f is the delta value and pdf = 1/n_matching, so the usual
    f*|cos|/pdf estimator is correct (the caller must NOT MIS-weight specular picks).
    """
    K = lobes["type"].shape[1]
    match = _matching_mask(lobes, include_specular)
    n_match = jnp.sum(match.astype(jnp.int32), axis=-1)
    # pick the `which`-th matching slot
    which = jnp.minimum((u_comp * n_match.astype(jnp.float32)).astype(jnp.int32),
                        jnp.maximum(n_match - 1, 0))
    cum = jnp.cumsum(match.astype(jnp.int32), axis=-1)  # (N,K)
    slot_sel = jnp.argmax((cum == (which + 1)[:, None]) & match, axis=-1)  # (N,)

    # gather chosen slot params — one-hot contraction over the (small) K axis
    # (take_along_axis per-lane minor-dim gathers are pathologically slow on TPU)
    oh = (slot_sel[:, None] == jnp.arange(K, dtype=jnp.int32))

    def gather(a):
        m = oh[..., None] if a.ndim == 3 else oh
        if jnp.issubdtype(a.dtype, jnp.integer):
            return jnp.sum(jnp.where(m, a, 0), axis=1)
        return jnp.sum(jnp.where(m, a, 0.0), axis=1)
    ch = {key: gather(lobes[key]) for key in lobes}

    wi, valid = lobe_sample_wi(ch["type"], wo, u1, u2, ch["f0"], ch["f1"], ch["f2"],
                               present)
    chosen_specular = (ch["type"] == SPEC_REFL) | (ch["type"] == SPEC_TRANS)
    valid = valid & (n_match > 0)

    # non-specular: f = Σ lobe_f, pdf = average over matching (incl. chosen)
    f_all = bsdf_f(lobes, wo, wi, present, include_specular, tables=tables)
    pdf_all = bsdf_pdf(lobes, wo, wi, present, include_specular)

    # specular: delta value from the chosen lobe; pdf = 1/n_match
    f_spec = lobe_specular_value(ch["type"], wo, wi, ch["R"], ch["S1"], ch["S2"],
                                 ch["f2"], ch["fr"],
                                 tuple(t for t in present if t in SPECULAR_TYPES))
    inv_n = 1.0 / jnp.maximum(n_match.astype(jnp.float32), 1.0)
    f = jnp.where(chosen_specular[:, None], f_spec, f_all)
    pdf = jnp.where(chosen_specular, inv_n, pdf_all)
    return {"wi": wi, "f": f, "pdf": pdf, "specular": chosen_specular,
            "valid": valid & (pdf > 0.0)}
