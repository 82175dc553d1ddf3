"""Real spherical harmonics — pbrt src/core/sh.{h,cpp} (SHTerms, SHIndex,
SHEvaluate, SHProjectIncidentDirectRadiance, SHComputeDiffuseTransfer,
SHConvolveCosTheta, SHConvolvePhong, SHReduceRinging, SHRotateZ) as batched jnp.

The associated-Legendre recurrence runs as static Python loops over (l,m) —
lmax is small (pbrt demos use 4-5) — so everything vectorizes over the
direction/point batch with no device control flow. pbrt's general SHRotate
(zyz Euler decomposition, sh.cpp) is replaced where needed by evaluating the
convolved expansion directly in the world frame, which is exact for radially
symmetric kernels (cosine / Phong lobes); only z-rotation is kept analytic.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from .vecmath import normalize


def sh_terms(lmax: int) -> int:
    """pbrt SHTerms: (lmax+1)^2 coefficients through band lmax."""
    return (lmax + 1) * (lmax + 1)


def sh_index(l: int, m: int) -> int:
    """pbrt SHIndex: flat index of band l, order m (m in [-l, l])."""
    return l * l + l + m


def _k(l: int, m: int) -> float:
    """Normalization K(l,m) = sqrt((2l+1)/(4pi) * (l-|m|)!/(l+|m|)!)."""
    m = abs(m)
    return math.sqrt((2 * l + 1) / (4 * math.pi)
                     * math.factorial(l - m) / math.factorial(l + m))


def sh_evaluate(w, lmax: int):
    """Y_i(w) for every SH basis function through band lmax.

    w: (..., 3) directions (normalized by callers; re-normalized here for
    safety). Returns (..., sh_terms(lmax)). Matches pbrt SHEvaluate (sh.cpp):
    Condon-Shortley-phased associated Legendre + sqrt(2) K cos/sin(m phi).
    """
    w = normalize(w)
    x, y, z = w[..., 0], w[..., 1], w[..., 2]

    # associated Legendre P_l^m(z) with sin^m(theta) folded in: work with
    # s = sin(theta) = sqrt(1-z^2) directly (numerically safe at poles)
    s2 = jnp.maximum(1.0 - z * z, 0.0)
    s = jnp.sqrt(s2)

    # P[m][l] built by recurrence
    P = {}
    pmm = jnp.ones_like(z)
    for m in range(lmax + 1):
        if m > 0:
            pmm = pmm * (-(2 * m - 1)) * s   # P_m^m = (-1)^m (2m-1)!! sin^m
        P[(m, m)] = pmm
        if m + 1 <= lmax:
            P[(m, m + 1)] = z * (2 * m + 1) * pmm
        for l in range(m + 2, lmax + 1):
            P[(m, l)] = ((2 * l - 1) * z * P[(m, l - 1)]
                         - (l + m - 1) * P[(m, l - 2)]) / (l - m)

    # cos(m phi), sin(m phi) scaled: cos_m * s^m == Re[(x+iy)^m], handled by
    # computing Cm = cos(m phi), Sm = sin(m phi) via atan-free recurrence on
    # the unit-circle projection (x/s, y/s); guard s ~ 0 (P has sin^m factor
    # that is 0 there anyway for m>0)
    safe_s = jnp.where(s < 1e-12, 1.0, s)
    cx = x / safe_s
    cy = y / safe_s
    cos_m = [jnp.ones_like(z), cx]
    sin_m = [jnp.zeros_like(z), cy]
    for m in range(2, lmax + 1):
        # angle-addition: (cos, sin)((m)phi) from ((m-1)phi) and (phi)
        cos_m.append(cos_m[-1] * cx - sin_m[-1] * cy)
        sin_m.append(sin_m[-1] * cx + cos_m[-2] * cy)

    out = [None] * sh_terms(lmax)
    sqrt2 = math.sqrt(2.0)
    for l in range(lmax + 1):
        out[sh_index(l, 0)] = _k(l, 0) * P[(0, l)]
        for m in range(1, l + 1):
            klm = _k(l, m)
            out[sh_index(l, m)] = sqrt2 * klm * cos_m[m] * P[(m, l)]
            out[sh_index(l, -m)] = sqrt2 * klm * sin_m[m] * P[(m, l)]
    return jnp.stack(out, axis=-1)


# --------------------------------------------------------------- convolutions
def _cos_theta_zh(lmax: int):
    """Zonal-harmonic coefficients A_l of clamped cos(theta) (Ramamoorthi &
    Hanrahan; what pbrt SHConvolveCosTheta's band weights encode)."""
    A = []
    for l in range(lmax + 1):
        if l == 0:
            A.append(math.pi)
        elif l == 1:
            A.append(2.0 * math.pi / 3.0)
        elif l % 2 == 1:
            A.append(0.0)
        else:
            h = l // 2
            A.append(2.0 * math.pi * ((-1.0) ** (h + 1)) / ((l + 2) * (l - 1))
                     * math.factorial(l)
                     / (2.0 ** l * math.factorial(h) ** 2))
    return A


def _band_scale(c_in, per_band):
    """Scale coefficients c (..., terms, C) by a per-band factor list."""
    lmax = len(per_band) - 1
    scale = jnp.asarray([per_band[l] for l in range(lmax + 1)
                         for _ in range(2 * l + 1)], jnp.float32)
    return c_in * scale[:, None]


def sh_convolve_cos_theta(lmax: int, c_in):
    """Convolve an incident-radiance expansion with clamped cosine (pbrt
    SHConvolveCosTheta): evaluating the result at n gives irradiance E(n).

    c_in: (..., terms, C). For constant unit radiance, E = pi."""
    # A_l here are already the "hat" coefficients (pi, 2pi/3, pi/4, ...):
    # E_lm = A_l * L_lm directly (Ramamoorthi & Hanrahan 2001)
    per_band = _cos_theta_zh(lmax)
    return _band_scale(c_in, per_band)


def sh_convolve_phong(lmax: int, n: float, c_in):
    """Convolve with a normalized Phong lobe of exponent n (pbrt
    SHConvolvePhong: band attenuation exp(-l^2/(2n)), unit DC gain so a
    constant environment reflects unchanged)."""
    per_band = [math.exp(-l * l / (2.0 * n)) for l in range(lmax + 1)]
    return _band_scale(c_in, per_band)


def sh_reduce_ringing(c_in, lmax: int, lam: float = 0.005):
    """pbrt SHReduceRinging: window band l by 1/(1 + lam (l(l+1))^2)."""
    per_band = [1.0 / (1.0 + lam * (l * (l + 1.0)) ** 2)
                for l in range(lmax + 1)]
    return _band_scale(c_in, per_band)


def sh_rotate_z(c_in, lmax: int, alpha: float):
    """Analytic rotation about z (pbrt SHRotateZ): per-(l,m) 2x2 rotation of
    the (m, -m) coefficient pair by m*alpha. c_in: (..., terms, C)."""
    out = [None] * sh_terms(lmax)
    for l in range(lmax + 1):
        out[sh_index(l, 0)] = c_in[..., sh_index(l, 0), :]
        for m in range(1, l + 1):
            ca = math.cos(m * alpha)
            sa = math.sin(m * alpha)
            cp = c_in[..., sh_index(l, m), :]
            cn = c_in[..., sh_index(l, -m), :]
            out[sh_index(l, m)] = ca * cp - sa * cn
            out[sh_index(l, -m)] = sa * cp + ca * cn
    return jnp.stack(out, axis=-2)
