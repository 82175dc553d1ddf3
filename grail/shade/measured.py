"""Measured BRDFs — pbrt src/materials/measured.cpp + src/core/reflection.cpp
(RegularHalfangleBRDF, IrregIsotropicBRDF) re-architected for TPU.

Both file formats end up as a dense Rusinkiewicz half/difference-angle table
(theta_half, theta_diff, phi_diff, rgb):

* MERL ``.binary`` keeps its native 90x90x180 grid and channel scales — the
  device lookup reproduces RegularHalfangleBRDF::f's nearest-cell fetch
  (including the sqrt warp on theta_half) exactly.
* pbrt ``.brdf`` irregular isotropic data is baked host-side onto a coarser
  half-angle grid with the same Shepard kernel the reference applies at
  runtime (exp(-100 d^2) over BRDFRemap space, measured.cpp / reflection.cpp
  IrregIsoProc) — a KdTree-at-eval-time is hostile to SPMD, so the
  interpolation happens once at scene build instead of per bounce.

Sampling/pdf for measured lobes is cosine-hemisphere, exactly the reference's
default BxDF::Sample_f (these BRDF classes don't override it).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..core.vecmath import dot, normalize

MERL_N_THETA_H = 90
MERL_N_THETA_D = 90
MERL_N_PHI_D = 180
# RegularHalfangleBRDF ctor scales (measured.cpp CreateMeasuredMaterial)
MERL_SCALES = (1.0 / 1500.0, 1.15 / 1500.0, 1.66 / 1500.0)


# --------------------------------------------------------------------- loaders

def read_merl(path):
    """MERL .binary -> (90, 90, 180, 3) float32 BRDF table."""
    with open(path, "rb") as f:
        dims = np.fromfile(f, np.int32, 3)
        n = int(dims[0]) * int(dims[1]) * int(dims[2])
        if n != MERL_N_THETA_H * MERL_N_THETA_D * MERL_N_PHI_D:
            raise ValueError(f"unexpected MERL dims {tuple(dims)} in {path}")
        data = np.fromfile(f, np.float64, 3 * n)
    if data.size != 3 * n:
        raise ValueError(f"truncated MERL file {path}")
    tab = data.reshape(3, MERL_N_THETA_H, MERL_N_THETA_D, MERL_N_PHI_D)
    tab = np.moveaxis(tab, 0, -1).astype(np.float32)
    tab *= np.asarray(MERL_SCALES, np.float32)
    return np.maximum(tab, 0.0)


def read_brdf(path):
    """pbrt .brdf (irregular isotropic) -> (samples (S,4) angles, rgb (S,3)).

    File layout (measured.cpp): numWavelengths, the wavelengths, then
    (theta_i, phi_i, theta_o, phi_o, spectrum...) tuples."""
    from ..scene.floatfile import read_float_file
    from ..core.spectrum import spd_to_rgb
    vals = np.asarray(read_float_file(path), np.float64)
    nwl = int(vals[0])
    wls = vals[1:1 + nwl]
    rest = vals[1 + nwl:]
    stride = 4 + nwl
    if rest.size % stride != 0:
        raise ValueError(f"malformed .brdf file {path}")
    rest = rest.reshape(-1, stride)
    angles = rest[:, :4].astype(np.float32)
    rgb = np.stack([np.asarray(spd_to_rgb(wls, row), np.float32)
                    for row in rest[:, 4:]], 0)
    return angles, np.maximum(rgb, 0.0)


# ------------------------------------------------------- half-angle machinery

def _sph_dir(theta, phi):
    st = np.sin(theta)
    return np.stack([st * np.cos(phi), st * np.sin(phi), np.cos(theta)], -1)


def _halfdiff_to_io(th, td, pd):
    """(theta_half, theta_diff, phi_diff) -> (wo, wi), phi_half = 0 (isotropy)."""
    wh = _sph_dir(th, np.zeros_like(th))
    wd = _sph_dir(td, pd)
    # rotate wd by theta_half about +y (brings the half vector to +z frame back)
    ct, st = np.cos(th), np.sin(th)
    wi = np.stack([ct * wd[..., 0] + st * wd[..., 2],
                   wd[..., 1],
                   -st * wd[..., 0] + ct * wd[..., 2]], -1)
    wo = 2.0 * np.sum(wi * wh, -1, keepdims=True) * wh - wi
    return wo, wi


def _brdf_remap_np(wo, wi):
    """reflection.cpp BRDFRemap: (sin_i*sin_o, dphi/pi, cos_i*cos_o)."""
    ci, co = wi[..., 2], wo[..., 2]
    si = np.sqrt(np.maximum(0.0, 1.0 - ci * ci))
    so = np.sqrt(np.maximum(0.0, 1.0 - co * co))
    phii = np.arctan2(wi[..., 1], wi[..., 0])
    phio = np.arctan2(wo[..., 1], wo[..., 0])
    dphi = phii - phio
    dphi = np.where(dphi < 0, dphi + 2 * np.pi, dphi)
    dphi = np.where(dphi > np.pi, 2 * np.pi - dphi, dphi)
    return np.stack([si * so, dphi / np.pi, ci * co], -1)


def bake_irregular(angles, rgb, nh=32, nd=16, npd=32):
    """Shepard-bake irregular (theta_i,phi_i,theta_o,phi_o) samples onto a
    half-angle grid — the build-time equivalent of IrregIsotropicBRDF::f's
    exp(-100 d^2) KdTree gather over BRDFRemap space."""
    wo_s, wi_s = (
        _sph_dir(angles[:, 2], angles[:, 3]),
        _sph_dir(angles[:, 0], angles[:, 1]),
    )
    m_s = _brdf_remap_np(wo_s, wi_s)                  # (S,3)

    th = ((np.arange(nh) + 0.5) / nh) ** 2 * (np.pi / 2)   # sqrt warp inverse
    td = (np.arange(nd) + 0.5) / nd * (np.pi / 2)
    pd = (np.arange(npd) + 0.5) / npd * np.pi
    TH, TD, PD = np.meshgrid(th, td, pd, indexing="ij")
    wo_g, wi_g = _halfdiff_to_io(TH, TD, PD)
    below = (wo_g[..., 2] <= 1e-4) | (wi_g[..., 2] <= 1e-4)
    m_g = _brdf_remap_np(wo_g, wi_g).reshape(-1, 3)   # (G,3)

    d2 = ((m_g[:, None, :] - m_s[None, :, :]) ** 2).sum(-1)   # (G,S)
    w = np.exp(-100.0 * d2)
    wsum = w.sum(1)
    # empty neighborhoods: fall back to the nearest sample (pbrt returns 0,
    # but a hole-free table behaves better under importance sampling)
    nearest = rgb[np.argmin(d2, axis=1)]
    vals = np.where(wsum[:, None] > 1e-12,
                    (w @ rgb) / np.maximum(wsum[:, None], 1e-12), nearest)
    vals = vals.reshape(nh, nd, npd, 3)
    vals[below] = 0.0
    return vals.astype(np.float32)


def albedo_estimate(table):
    """Rough hemispherical reflectance (fallback shading + Power heuristics)."""
    return float(np.pi) * np.asarray(table, np.float32).mean(axis=(0, 1, 2))


# ------------------------------------------------------------- device lookup

def _halfdiff_coords(wo, wi):
    """(N,3)x2 local dirs -> (theta_half, theta_diff, phi_diff) jnp arrays."""
    wh = normalize(wo + wi)
    th = jnp.arccos(jnp.clip(wh[..., 2], -1.0, 1.0))
    ph = jnp.arctan2(wh[..., 1], wh[..., 0])
    # rotate wi: z-rot by -ph then y-rot by -th (reflection.cpp ::f)
    cph, sph = jnp.cos(ph), jnp.sin(ph)
    x1 = cph * wi[..., 0] + sph * wi[..., 1]
    y1 = -sph * wi[..., 0] + cph * wi[..., 1]
    z1 = wi[..., 2]
    ct, st = jnp.cos(th), jnp.sin(th)
    xd = ct * x1 - st * z1
    zd = st * x1 + ct * z1
    td = jnp.arccos(jnp.clip(zd, -1.0, 1.0))
    pd = jnp.arctan2(y1, xd)
    pd = jnp.where(pd < 0.0, pd + jnp.pi, pd)        # reciprocity fold to [0,pi)
    return th, td, pd


def lookup(tables, grid_id, wo, wi):
    """Nearest-cell half-angle fetch (RegularHalfangleBRDF::f semantics,
    including the sqrt warp on theta_half). tables: static tuple of
    (NH,ND,NP,3) arrays; grid_id (N,) int32 row per lane."""
    n = wo.shape[0]
    out = jnp.zeros((n, 3), jnp.float32)
    if not tables:
        return out
    th, td, pd = _halfdiff_coords(wo, wi)
    for gi, tab in enumerate(tables):
        nh, nd, npd = tab.shape[0], tab.shape[1], tab.shape[2]
        ih = jnp.clip((jnp.sqrt(jnp.maximum(th / (jnp.pi / 2), 0.0))
                       * nh).astype(jnp.int32), 0, nh - 1)
        idd = jnp.clip((td / (jnp.pi / 2) * nd).astype(jnp.int32), 0, nd - 1)
        ip = jnp.clip((pd / jnp.pi * npd).astype(jnp.int32), 0, npd - 1)
        flat = tab.reshape(-1, 3)
        v = flat[(ih * nd + idd) * npd + ip]
        out = jnp.where((grid_id == gi)[..., None], v, out)
    return out
