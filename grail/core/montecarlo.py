"""Monte Carlo sampling library — the jnp analog of pbrt src/core/montecarlo.{h,cpp}.

All routines are pure functions over batched uniforms; piecewise distributions are
CDF tables sampled with searchsorted (vectorized binary search) instead of the
reference's per-call linear walk.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .vecmath import PI, TWO_PI, INV_PI, INV_TWOPI, INV_FOURPI


# ------------------------------------------------------------------ basic warps
def uniform_sample_hemisphere(u1, u2):
    z = u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_hemisphere_pdf():
    return INV_TWOPI


def uniform_sample_sphere(u1, u2):
    z = 1.0 - 2.0 * u1
    r = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def uniform_sphere_pdf():
    return INV_FOURPI


def uniform_sample_disk(u1, u2):
    r = jnp.sqrt(u1)
    theta = TWO_PI * u2
    return r * jnp.cos(theta), r * jnp.sin(theta)


def concentric_sample_disk(u1, u2):
    """Shirley-Chiu concentric map (pbrt montecarlo.cpp ConcentricSampleDisk),
    branch-free formulation."""
    sx = 2.0 * u1 - 1.0
    sy = 2.0 * u2 - 1.0
    zero = (sx == 0.0) & (sy == 0.0)
    use_x = jnp.abs(sx) > jnp.abs(sy)
    r = jnp.where(use_x, sx, sy)
    theta = jnp.where(
        use_x,
        (PI / 4.0) * (sy / jnp.where(sx == 0.0, 1.0, sx)),
        (PI / 2.0) - (PI / 4.0) * (sx / jnp.where(sy == 0.0, 1.0, sy)),
    )
    dx = jnp.where(zero, 0.0, r * jnp.cos(theta))
    dy = jnp.where(zero, 0.0, r * jnp.sin(theta))
    return dx, dy


def cosine_sample_hemisphere(u1, u2):
    dx, dy = concentric_sample_disk(u1, u2)
    z = jnp.sqrt(jnp.maximum(0.0, 1.0 - dx * dx - dy * dy))
    return jnp.stack([dx, dy, z], axis=-1)


def cosine_hemisphere_pdf(costheta):
    return costheta * INV_PI


def uniform_sample_cone(u1, u2, cos_theta_max):
    """Directions in a cone about +z (pbrt UniformSampleCone)."""
    costheta = (1.0 - u1) + u1 * cos_theta_max
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = u2 * TWO_PI
    return jnp.stack(
        [jnp.cos(phi) * sintheta, jnp.sin(phi) * sintheta, costheta], axis=-1
    )


def uniform_cone_pdf(cos_theta_max):
    return 1.0 / (TWO_PI * jnp.maximum(1.0 - cos_theta_max, 1e-8))


def uniform_sample_triangle(u1, u2):
    """Barycentrics (b0,b1) (pbrt UniformSampleTriangle)."""
    su1 = jnp.sqrt(u1)
    return 1.0 - su1, u2 * su1


def sample_hg(w, u1, u2, g):
    """Henyey-Greenstein phase sampling about direction w (pbrt SampleHG)."""
    iso = jnp.abs(g) < 1e-3
    costheta_iso = 1.0 - 2.0 * u1
    sq = (1.0 - g * g) / jnp.maximum(1.0 - g + 2.0 * g * u1, 1e-8)
    costheta_hg = (1.0 + g * g - sq * sq) / jnp.maximum(2.0 * jnp.abs(g), 1e-8)
    costheta = jnp.where(iso, costheta_iso, costheta_hg)
    sintheta = jnp.sqrt(jnp.maximum(0.0, 1.0 - costheta * costheta))
    phi = TWO_PI * u2
    from .vecmath import coordinate_system, spherical_direction_basis
    v1, v2 = coordinate_system(w)
    return spherical_direction_basis(sintheta, costheta, phi, v1, v2, w)


def hg_pdf(cos_theta, g):
    """HG phase function value == its pdf (pbrt PhaseHG)."""
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return INV_FOURPI * (1.0 - g * g) / jnp.maximum(denom * jnp.sqrt(jnp.maximum(denom, 1e-12)), 1e-12)


# --------------------------------------------------------------------- MIS heuristics
def balance_heuristic(nf, f_pdf, ng, g_pdf):
    return (nf * f_pdf) / jnp.maximum(nf * f_pdf + ng * g_pdf, 1e-12)


def power_heuristic(nf, f_pdf, ng, g_pdf):
    """beta=2 power heuristic (pbrt montecarlo.h PowerHeuristic) — used by
    EstimateDirect."""
    f = nf * f_pdf
    g = ng * g_pdf
    return (f * f) / jnp.maximum(f * f + g * g, 1e-12)


# ---------------------------------------------------------------- piecewise constants
def batched_searchsorted(cdf, u):
    """Last interval index i with cdf[..., i] <= u, clipped to [0, n-2].

    cdf (..., n) monotone, u (...) broadcastable with cdf[..., 0]. Vectorized
    binary search (static log2 steps) so it fuses on the VPU.
    """
    n = cdf.shape[-1]
    lo = jnp.zeros(jnp.broadcast_shapes(u.shape, cdf.shape[:-1]), jnp.int32)
    hi = jnp.full_like(lo, n - 1)
    steps = max(1, int(math.ceil(math.log2(n))) + 1)
    for _ in range(steps):
        mid = (lo + hi + 1) // 2
        cm = jnp.take_along_axis(
            jnp.broadcast_to(cdf, lo.shape + (n,)), mid[..., None], axis=-1
        )[..., 0]
        go_right = cm <= u
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid - 1)
    return jnp.clip(lo, 0, n - 2)


def _gather_last(a, idx):
    """a (..., n), idx (...) → a[..., idx] elementwise over batch dims."""
    n = a.shape[-1]
    a = jnp.broadcast_to(a, idx.shape + (n,))
    return jnp.take_along_axis(a, idx[..., None], axis=-1)[..., 0]


def build_distribution_1d(func):
    """func (...,n) ≥0 → dict with cdf (...,n+1), func_int (...,).

    Equivalent of pbrt Distribution1D's constructor; works batched (host or device).
    """
    func = jnp.asarray(func, jnp.float32)
    n = func.shape[-1]
    c = jnp.cumsum(func, axis=-1) / n
    func_int = c[..., -1]
    cdf = jnp.concatenate([jnp.zeros(func.shape[:-1] + (1,), jnp.float32), c], axis=-1)
    # degenerate (all-zero) distribution → uniform cdf
    uniform = jnp.linspace(0.0, 1.0, n + 1, dtype=jnp.float32)
    safe = func_int[..., None] > 0.0
    cdf = jnp.where(safe, cdf / jnp.where(safe, func_int[..., None], 1.0), uniform)
    return {"func": func, "cdf": cdf, "func_int": func_int}


def sample_distribution_1d_continuous(dist, u):
    """u (...,) → (x in [0,1), pdf, offset). pbrt Distribution1D::SampleContinuous."""
    cdf, func, func_int = dist["cdf"], dist["func"], dist["func_int"]
    n = func.shape[-1]
    off = batched_searchsorted(cdf, u)
    c0 = _gather_last(cdf, off)
    c1 = _gather_last(cdf, off + 1)
    du = (u - c0) / jnp.maximum(c1 - c0, 1e-12)
    x = (off.astype(jnp.float32) + du) / n
    pdf = _gather_last(func, off) / jnp.maximum(func_int, 1e-12)
    return x, pdf, off


def sample_distribution_1d_discrete(dist, u):
    """u (...,) → (index, pmf). pbrt Distribution1D::SampleDiscrete."""
    cdf, func, func_int = dist["cdf"], dist["func"], dist["func_int"]
    n = func.shape[-1]
    off = batched_searchsorted(cdf, u)
    pmf = _gather_last(func, off) / jnp.maximum(func_int * n, 1e-12)
    return off, pmf


def distribution_1d_pdf_discrete(dist, idx):
    func, func_int = dist["func"], dist["func_int"]
    n = func.shape[-1]
    return _gather_last(func, idx) / jnp.maximum(func_int * n, 1e-12)


def build_distribution_2d(func):
    """func (nv, nu) → marginal over v + conditional over u (pbrt Distribution2D)."""
    func = jnp.asarray(func, jnp.float32)
    cond = build_distribution_1d(func)                     # batched over rows
    marg = build_distribution_1d(cond["func_int"])         # (nv,)
    return {"cond": cond, "marg": marg}


def sample_distribution_2d(dist, u1, u2):
    """(u1,u2) → ((u,v) in [0,1)^2, pdf). iv gathers rows of the conditional."""
    v, pdf_v, iv = sample_distribution_1d_continuous(dist["marg"], u2)
    cond_row = {
        "func": dist["cond"]["func"][iv],       # (..., nu)
        "cdf": dist["cond"]["cdf"][iv],         # (..., nu+1)
        "func_int": dist["cond"]["func_int"][iv],
    }
    u, pdf_u, _ = sample_distribution_1d_continuous(cond_row, u1)
    return u, v, pdf_u * pdf_v


def distribution_2d_pdf(dist, u, v):
    """pdf at continuous (u,v) (pbrt Distribution2D::Pdf)."""
    func = dist["cond"]["func"]
    nv, nu = func.shape
    iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
    marg_int = dist["marg"]["func_int"]
    return func[iv, iu] / jnp.maximum(marg_int, 1e-12)
