"""Precomputed radiance transfer — pbrt src/integrators/diffuseprt.cpp,
glossyprt.cpp, useprobes.cpp + src/renderers/createprobes.cpp, on top of the
batched SH library (core/sh.py; pbrt src/core/sh.{h,cpp}).

Wavefront reshape: pbrt computes SH projections per intersection with scalar
loops; here each projection is a static loop over (light x sample) drawing
counter-based dims, fully vectorized over the shade-point batch. Instead of
pbrt's per-point SHRotate + transfer *matrix* (glossyprt.cpp), the transferred
radiance c_t is projected directly in the world frame and the Phong-convolved
expansion is evaluated at the mirror direction — exact for the radially
symmetric lobe, and O(terms) per point instead of O(terms^2).
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core import sh
from ..core.vecmath import dot, normalize, absdot
from ..kernels import intersect as isect
from ..shade import lights as lt
from ..shade import geometry as geom

_DIM_BASE = 5000     # sampler-dimension block reserved for PRT projections


def project_incident_direct(scene, meta, p, eps, lmax, n_samples, pix, samp,
                            dim_base=_DIM_BASE, with_visibility=True):
    """SHProjectIncidentDirectRadiance (sh.cpp): MC-project the direct
    radiance incident at p (N,3) onto SH by sampling every light.

    with_visibility=False skips the shadow rays (the distant-lighting
    projection at the scene center in DiffusePRT/GlossyPRT Preprocess).
    Returns c (N, terms, 3)."""
    n = p.shape[0]
    terms = sh.sh_terms(lmax)
    c = jnp.zeros((n, terms, 3), jnp.float32)
    n_lights = meta.n_lights
    for lrow in range(n_lights):
        lidx = jnp.full((n,), lrow, jnp.int32)
        for s in range(n_samples):
            d0 = dim_base + (lrow * n_samples + s) * 3
            u1, u2 = rngmod.sample_2d(meta.sampler, pix, samp, d0)
            u3 = rngmod.sample_1d(meta.sampler, pix, samp, d0 + 2)
            ls = lt.sample_li(scene, lidx, p, u1, u2, u3, meta.light_types,
                              meta.light_image_rows)
            ok = (ls["pdf"] > 0.0) & jnp.any(ls["radiance"] > 0.0, axis=-1)
            if with_visibility:
                occ = isect.intersect_p(
                    scene, p + ls["wi"] * eps[..., None], ls["wi"],
                    jnp.where(ok, ls["dist"] - 2.0 * eps, 0.0))
            else:
                occ = jnp.zeros(p.shape[0], jnp.bool_)
            w = jnp.where(ok & ~occ,
                          1.0 / (jnp.maximum(ls["pdf"], 1e-12) * n_samples),
                          0.0)
            Y = sh.sh_evaluate(ls["wi"], lmax)                 # (N,terms)
            c = c + Y[..., None] * (ls["radiance"] * w[..., None])[:, None, :]
    return c


def compute_diffuse_transfer(scene, meta, p, ns_normal, eps, lmax, n_samples,
                             pix, samp, dim_base=_DIM_BASE + 50000):
    """SHComputeDiffuseTransfer (sh.cpp): T_i = (1/ns) sum Y_i(w) V(w)
    max(0, w.n) / pdf over uniform-sphere samples. Returns (N, terms)."""
    n = p.shape[0]
    terms = sh.sh_terms(lmax)
    T = jnp.zeros((n, terms), jnp.float32)
    pdf = 1.0 / (4.0 * math.pi)
    for s in range(n_samples):
        u1, u2 = rngmod.sample_2d(meta.sampler, pix, samp, dim_base + s)
        w = mc.uniform_sample_sphere(u1, u2)                   # (N,3)
        cosw = dot(w, ns_normal)
        ok = cosw > 0.0
        occ = isect.intersect_p(scene, p + w * eps[..., None], w,
                                jnp.where(ok, 1.0e7, 0.0) * jnp.ones_like(cosw))
        wgt = jnp.where(ok & ~occ, cosw / (pdf * n_samples), 0.0)
        T = T + sh.sh_evaluate(w, lmax) * wgt[..., None]
    return T


def _scene_center(scene):
    v = scene["verts"]
    return (jnp.min(v, axis=0) + jnp.max(v, axis=0)) * 0.5


def prt_preprocess(scene, meta, cfg):
    """DiffusePRT/GlossyPRT Preprocess: project incident direct radiance at
    the scene bound's center (distant-lighting assumption, diffuseprt.cpp)."""
    lmax = cfg.prt_lmax
    p = _scene_center(scene)[None, :]
    pix = jnp.zeros((1,), jnp.uint32)
    samp = jnp.zeros((1,), jnp.uint32)
    eps = jnp.full((1,), 1e-3, jnp.float32)
    c = project_incident_direct(scene, meta, p, eps, lmax, cfg.prt_nsamples,
                                pix, samp, with_visibility=False)
    return {"c_in": sh.sh_reduce_ringing(c[0], lmax)}          # (terms,3)


def _diffuse_albedo(lobes):
    """Sum of Lambertian/Oren-Nayar lobe reflectances (bsdf->rho analog)."""
    from ..shade import bsdf as bx
    diffuse = (lobes["type"] == bx.LAMBERT) | \
              (lobes["type"] == bx.OREN_NAYAR)
    return jnp.sum(jnp.where(diffuse[..., None], lobes["R"], 0.0), axis=1)


def diffuseprt_li(scene, meta, cfg, rays, pix, samp, aux):
    """DiffusePRTIntegrator::Li: Lo = (rho/pi) sum_i c_in[i] T[i], with T the
    visibility-masked cosine transfer vector at the shade point."""
    from .integrator import _shade_context
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    lmax = cfg.prt_lmax
    hit = isect.intersect(scene, o, d, jnp.full((n,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, _ = _shade_context(scene, meta, hit, o, d)
    # gather over the hemisphere facing the viewer (face-forward, as the
    # BSDF's geometric-normal sidedness logic does in reflection.cpp)
    nf = jnp.where(dot(sg["ns"], -d)[..., None] < 0.0, -sg["ns"], sg["ns"])
    T = compute_diffuse_transfer(scene, meta, sg["p"], nf, sg["ray_eps"],
                                 lmax, cfg.prt_nsamples, pix, samp)
    E = jnp.einsum("ni,ic->nc", T, aux["c_in"], precision="highest")
    rho = _diffuse_albedo(lobes)
    L = rho / math.pi * E
    # escaped rays see the environment directly
    Lesc = lt.escaped_radiance(scene, d, meta.light_types)
    L = jnp.where(active[..., None], jnp.maximum(L, 0.0), Lesc)
    return L * rays["weight"][..., None]


def glossyprt_li(scene, meta, cfg, rays, pix, samp, aux):
    """GlossyPRTIntegrator::Li: transferred radiance c_t projected at the
    point (visibility x incident), convolved with the material's Phong lobe,
    evaluated at the mirror direction and scaled by Ks."""
    from .integrator import _shade_context
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    lmax = cfg.prt_lmax
    terms = sh.sh_terms(lmax)
    hit = isect.intersect(scene, o, d, jnp.full((n,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, _ = _shade_context(scene, meta, hit, o, d)
    ns = jnp.where(dot(sg["ns"], -d)[..., None] < 0.0, -sg["ns"], sg["ns"])
    p, eps = sg["p"], sg["ray_eps"]

    # c_t: project V(w)·L_in(w) (L_in reconstructed from c_in) at the point
    c_in = aux["c_in"]                                          # (terms,3)
    c_t = jnp.zeros((n, terms, 3), jnp.float32)
    pdf = 1.0 / (4.0 * math.pi)
    for s in range(cfg.prt_nsamples):
        u1, u2 = rngmod.sample_2d(meta.sampler, pix, samp,
                                  _DIM_BASE + 100000 + s)
        w = mc.uniform_sample_sphere(u1, u2)
        occ = isect.intersect_p(scene, p + w * eps[..., None], w,
                                jnp.full((n,), 1.0e7, jnp.float32))
        Y = sh.sh_evaluate(w, lmax)                             # (N,terms)
        Lw = jnp.einsum("ni,ic->nc", Y, c_in, precision="highest")
        Lw = jnp.maximum(Lw, 0.0)
        wgt = jnp.where(~occ, 1.0 / (pdf * cfg.prt_nsamples), 0.0)
        c_t = c_t + Y[..., None] * (Lw * wgt[..., None])[:, None, :]

    # glossyprt.cpp takes the BRDF from integrator params (Kd/Ks/roughness),
    # not the scene material
    ks = jnp.asarray(cfg.prt_ks, jnp.float32)
    expo = jnp.full((n,), 1.0 / max(cfg.prt_roughness, 1e-4), jnp.float32)
    # evaluate the Phong-convolved expansion at the mirror direction; band
    # attenuation depends on a per-point exponent -> apply per-band scale
    wo = -d
    wr = normalize(2.0 * dot(wo, ns)[..., None] * ns - wo)
    Y_r = sh.sh_evaluate(wr, lmax)                              # (N,terms)
    band = jnp.concatenate(
        [jnp.exp(-l * l / (2.0 * expo))[:, None] *
         jnp.ones((n, 2 * l + 1), jnp.float32) for l in range(lmax + 1)],
        axis=1)                                                 # (N,terms)
    Lr = jnp.sum((Y_r * band)[..., None] * c_t, axis=1)         # (N,3)
    # unit-DC-gain lobe convention (sh_convolve_phong): a constant visible
    # environment reflects as ks * L, i.e. ks is the lobe's albedo
    L = ks * jnp.maximum(Lr, 0.0)
    # + the Kd diffuse term over the same transferred radiance
    kd = jnp.asarray(cfg.prt_kd, jnp.float32)
    ce = sh.sh_convolve_cos_theta(lmax, c_t)
    Yn = sh.sh_evaluate(ns, lmax)
    E = jnp.maximum(jnp.sum(Yn[..., None] * ce, axis=1), 0.0)
    L = L + kd / math.pi * E
    Lesc = lt.escaped_radiance(scene, d, meta.light_types)
    L = jnp.where(active[..., None], L, Lesc)
    return L * rays["weight"][..., None]


# ------------------------------------------------------------------- probes
def bake_probes(scene, meta, cfg, nx, ny, nz, n_samples=64, lmax=None):
    """createprobes.cpp: SH-project incident direct radiance at each cell
    center of an (nx,ny,nz) grid over the scene bounds. Returns the probe
    dict consumed by useprobes_li."""
    lmax = lmax if lmax is not None else cfg.prt_lmax
    v = scene["verts"]
    bmin = jnp.min(v, axis=0)
    bmax = jnp.max(v, axis=0)
    xs = (jnp.arange(nx) + 0.5) / nx
    ys = (jnp.arange(ny) + 0.5) / ny
    zs = (jnp.arange(nz) + 0.5) / nz
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    t = jnp.stack([gx, gy, gz], axis=-1).reshape(-1, 3)
    p = bmin + t * (bmax - bmin)
    n = p.shape[0]
    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros((n,), jnp.uint32)
    eps = jnp.full((n,), 1e-3, jnp.float32)
    c = project_incident_direct(scene, meta, p, eps, lmax, n_samples, pix,
                                samp)
    return {"coeffs": c.reshape(nx, ny, nz, sh.sh_terms(lmax), 3),
            "bmin": bmin, "bmax": bmax, "lmax": lmax}


def write_probes(path, probes):
    """Serialize probes as a #-commented float file (pbrt writes its probe
    grid as a text float file too; floatfile.cpp reads it back)."""
    import numpy as np
    c = np.asarray(probes["coeffs"])
    nx, ny, nz, terms, _ = c.shape
    with open(path, "w") as f:
        f.write("# grail radiance probes (createprobes.cpp analog)\n")
        f.write(f"{nx} {ny} {nz} {terms}\n")
        bmin = np.asarray(probes["bmin"])
        bmax = np.asarray(probes["bmax"])
        f.write(" ".join(f"{x:.9g}" for x in list(bmin) + list(bmax)) + "\n")
        for val in c.reshape(-1):
            f.write(f"{val:.9g}\n")


def read_probes(path):
    import numpy as np
    with open(path) as f:
        lines = [ln for ln in f if not ln.startswith("#")]
    nx, ny, nz, terms = (int(x) for x in lines[0].split())
    bounds = [float(x) for x in lines[1].split()]
    vals = np.asarray([float(x) for ln in lines[2:] for x in ln.split()],
                      np.float32)
    lmax = int(math.isqrt(terms)) - 1
    return {"coeffs": jnp.asarray(vals.reshape(nx, ny, nz, terms, 3)),
            "bmin": jnp.asarray(bounds[:3], jnp.float32),
            "bmax": jnp.asarray(bounds[3:], jnp.float32),
            "lmax": lmax}


def useprobes_li(scene, meta, cfg, rays, pix, samp, aux):
    """useprobes.cpp UseRadianceProbes::Li: trilinearly interpolate the probe
    SH coefficients at the shade point, cosine-convolve, evaluate E(ns), and
    shade the diffuse component; escaped rays see the environment."""
    from .integrator import _shade_context
    probes = aux["probes"]
    o, d = rays["o"], rays["d"]
    n = o.shape[0]
    # static under jit: terms from the coeffs shape, not the (traced) field
    lmax = int(math.isqrt(int(probes["coeffs"].shape[3]))) - 1
    hit = isect.intersect(scene, o, d, jnp.full((n,), 1.0e7, jnp.float32))
    active = hit["prim"] >= 0
    sg, lobes, _ = _shade_context(scene, meta, hit, o, d)

    c = probes["coeffs"]                                       # (nx,ny,nz,T,3)
    nx, ny, nz = c.shape[:3]
    t = (sg["p"] - probes["bmin"]) / jnp.maximum(
        probes["bmax"] - probes["bmin"], 1e-9)
    gx = jnp.clip(t[:, 0] * nx - 0.5, 0.0, nx - 1.0)
    gy = jnp.clip(t[:, 1] * ny - 0.5, 0.0, ny - 1.0)
    gz = jnp.clip(t[:, 2] * nz - 0.5, 0.0, nz - 1.0)
    ix = jnp.floor(gx).astype(jnp.int32)
    iy = jnp.floor(gy).astype(jnp.int32)
    iz = jnp.floor(gz).astype(jnp.int32)
    fx = (gx - ix)[:, None, None]
    fy = (gy - iy)[:, None, None]
    fz = (gz - iz)[:, None, None]
    ix1 = jnp.minimum(ix + 1, nx - 1)
    iy1 = jnp.minimum(iy + 1, ny - 1)
    iz1 = jnp.minimum(iz + 1, nz - 1)

    def corner(ax, ay, az):
        return c[ax, ay, az]                                   # (N,T,3)

    c00 = corner(ix, iy, iz) * (1 - fz) + corner(ix, iy, iz1) * fz
    c01 = corner(ix, iy1, iz) * (1 - fz) + corner(ix, iy1, iz1) * fz
    c10 = corner(ix1, iy, iz) * (1 - fz) + corner(ix1, iy, iz1) * fz
    c11 = corner(ix1, iy1, iz) * (1 - fz) + corner(ix1, iy1, iz1) * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    c_p = c0 * (1 - fx) + c1 * fx                               # (N,T,3)

    ce = sh.sh_convolve_cos_theta(lmax, c_p)
    Yn = sh.sh_evaluate(sg["ns"], lmax)                         # (N,T)
    E = jnp.maximum(jnp.sum(Yn[..., None] * ce, axis=1), 0.0)   # (N,3)
    rho = _diffuse_albedo(lobes)
    L = rho / math.pi * E
    Lesc = lt.escaped_radiance(scene, d, meta.light_types)
    L = jnp.where(active[..., None], L, Lesc)
    return L * rays["weight"][..., None]
