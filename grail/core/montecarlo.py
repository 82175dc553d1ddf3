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
#
# TPU indexing rules (measured on v5e): plain 1-D gathers `flat[idx]` run at
# HBM speed; `take_along_axis` with per-lane minor indices and mixed
# advanced+basic indexing (`tab[rows, :3, 3]`) hit an XLA gather path ~1000x
# slower. Everything below therefore indexes through flattened tables.

_COUNT_MAX = 64   # linear count beats log2 gathers up to this table width


def batched_searchsorted(cdf, u):
    """Last interval index i with cdf[..., i] <= u, clipped to [0, n-2].

    cdf (..., n) monotone, u (...) broadcastable with cdf[..., 0]. Small
    tables use a counting sum (pure VPU compares, no gather); shared 1-D
    tables use binary search with plain gathers.
    """
    n = cdf.shape[-1]
    if n <= _COUNT_MAX or cdf.ndim > 1:
        # counting: fully vectorized compares; O(n) per lane but gather-free
        cnt = jnp.sum((cdf[..., 1:-1] <= u[..., None]).astype(jnp.int32),
                      axis=-1)
        return jnp.clip(cnt, 0, n - 2)
    lo = jnp.zeros(u.shape, jnp.int32)
    hi = jnp.full(u.shape, n - 1, jnp.int32)
    for _ in range(max(1, int(math.ceil(math.log2(n))) + 1)):
        mid = (lo + hi + 1) // 2
        cm = cdf[mid]
        go_right = cm <= u
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid - 1)
    return jnp.clip(lo, 0, n - 2)


def searchsorted_rows(cdf_tab, rows, u):
    """Per-lane interval search in a table of CDF rows.

    cdf_tab (R, n), rows (N,) int32 row per lane, u (N,). Returns (N,) index
    in [0, n-2]. Binary search with flat 1-D gathers (the fast TPU pattern);
    avoids ever materializing the (N, n) per-lane rows.
    """
    r, n = cdf_tab.shape
    flat = cdf_tab.reshape(-1)
    base = rows * n
    if n <= _COUNT_MAX and r == 1:
        return batched_searchsorted(cdf_tab[0], u)
    lo = jnp.zeros(u.shape, jnp.int32)
    hi = jnp.full(u.shape, n - 1, jnp.int32)
    for _ in range(max(1, int(math.ceil(math.log2(n))) + 1)):
        mid = (lo + hi + 1) // 2
        cm = flat[base + mid]
        go_right = cm <= u
        lo = jnp.where(go_right, mid, lo)
        hi = jnp.where(go_right, hi, mid - 1)
    return jnp.clip(lo, 0, n - 2)


def gather_rows(tab, rows, idx):
    """tab (R, n), rows (N,), idx (N,) → tab[rows, idx] via flat 1-D gather."""
    return tab.reshape(-1)[rows * tab.shape[-1] + idx]


def _gather_last(a, idx):
    """a (..., n), idx (...) → a[..., idx] elementwise over batch dims.

    Gather-free for small n (one-hot contraction); flat gather otherwise."""
    n = a.shape[-1]
    if n <= _COUNT_MAX:
        iota = jnp.arange(n, dtype=jnp.int32)
        oh = (idx[..., None] == iota).astype(a.dtype)
        return jnp.sum(jnp.broadcast_to(a, idx.shape + (n,)) * oh, axis=-1)
    if a.ndim == 1:
        return a[idx]
    a = jnp.broadcast_to(a, idx.shape + (n,))
    flat = a.reshape(-1, n)
    lane = jnp.arange(flat.shape[0], dtype=jnp.int32)
    return flat.reshape(-1)[lane * n + idx.reshape(-1)].reshape(idx.shape)


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
    """(u1,u2) → ((u,v) in [0,1)^2, pdf). Conditional rows are addressed with
    flat gathers — the per-lane (N, nu) row materialization the naive
    `cond["cdf"][iv]` would do costs O(N·nu) memory and a slow TPU gather."""
    v, pdf_v, iv = sample_distribution_1d_continuous(dist["marg"], u2)
    cond = dist["cond"]
    nu = cond["func"].shape[-1]
    off = searchsorted_rows(cond["cdf"], iv, u1)
    c0 = gather_rows(cond["cdf"], iv, off)
    c1 = gather_rows(cond["cdf"], iv, off + 1)
    du = (u1 - c0) / jnp.maximum(c1 - c0, 1e-12)
    u = (off.astype(jnp.float32) + du) / nu
    f_int = cond["func_int"][iv]
    pdf_u = gather_rows(cond["func"], iv, off) / jnp.maximum(f_int, 1e-12)
    return u, v, pdf_u * pdf_v


def distribution_2d_pdf(dist, u, v):
    """pdf at continuous (u,v) (pbrt Distribution2D::Pdf)."""
    func = dist["cond"]["func"]
    nv, nu = func.shape
    iu = jnp.clip((u * nu).astype(jnp.int32), 0, nu - 1)
    iv = jnp.clip((v * nv).astype(jnp.int32), 0, nv - 1)
    marg_int = dist["marg"]["func_int"]
    return gather_rows(func, iv, iu) / jnp.maximum(marg_int, 1e-12)
