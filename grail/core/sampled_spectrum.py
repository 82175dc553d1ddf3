"""30-band SampledSpectrum rendering (pbrt src/core/spectrum.cpp
SampledSpectrum / FromRGB with the Smits-style smooth-reflectance promotion).

pbrt compiles the spectral representation in (PBRT_SAMPLED_SPECTRUM) and
threads CoefficientSpectrum<30> through every Spectrum operation. The TPU
framework keeps trailing-dim-3 arrays as its working layout instead — the
whole compute path is band-count agnostic arithmetic — and renders a
spectral image as TEN 3-BAND PASSES: every color-carrying scene table is
promoted RGB → 30 bands at build (Smits-style basis combination of
smoothest-metamer basis spectra), pass g renders bands [3g, 3g+3) through
the unmodified RGB machinery, and the passes integrate against the CIE
curves to XYZ → sRGB. Band-wise multiplication of promoted reflectances and
emitters is exactly SampledSpectrum arithmetic, so multi-bounce tinting
picks up the spectral (not RGB-product) behavior; only the 3-band grouping
is an implementation layout.

Basis spectra are computed at import by a tiny projected-gradient solve of
  min ||D s||^2  s.t.  M s = rgb_c,  s >= 0
(D = second difference, M = band-averaged CIE -> sRGB) for the seven Smits
targets (white/cyan/magenta/yellow/red/green/blue) — the smoothest
nonnegative metamers, same construction Smits 1999 tabulates.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .spectrum import (_CIE_X, _CIE_Y, _CIE_Z, _CIE_LAMBDA, XYZ_TO_RGB,
                       CIE_Y_INTEGRAL)

N_BANDS = 30
LAMBDA_MIN, LAMBDA_MAX = 400.0, 700.0   # pbrt sampledLambdaStart/End
BAND_EDGES = np.linspace(LAMBDA_MIN, LAMBDA_MAX, N_BANDS + 1)


def _band_average(curve):
    """Average a CIE curve over each band (pbrt AverageSpectrumSamples)."""
    out = np.zeros(N_BANDS)
    for b in range(N_BANDS):
        lo, hi = BAND_EDGES[b], BAND_EDGES[b + 1]
        lam = np.linspace(lo, hi, 16)
        out[b] = np.interp(lam, _CIE_LAMBDA, curve).mean()
    return out


_XBAR = _band_average(_CIE_X)
_YBAR = _band_average(_CIE_Y)
_ZBAR = _band_average(_CIE_Z)
_DLAM = (LAMBDA_MAX - LAMBDA_MIN) / N_BANDS

# spectrum (30,) -> linear sRGB (3,): XYZ integration + sRGB matrix
SPEC_TO_RGB = (XYZ_TO_RGB @ np.stack([_XBAR, _YBAR, _ZBAR])
               * _DLAM / CIE_Y_INTEGRAL).astype(np.float64)     # (3, 30)


def _smoothest_metamer(rgb, iters=4000):
    """min ||D s||^2 s.t. M s = rgb, s >= 0 via penalty projected gradient."""
    M = SPEC_TO_RGB
    D = (np.diff(np.eye(N_BANDS), n=2, axis=0))                 # (28, 30)
    rho = 1e4
    A = D.T @ D + rho * M.T @ M
    b = rho * M.T @ np.asarray(rgb, np.float64)
    s = np.full(N_BANDS, max(np.mean(rgb), 0.0))
    lr = 1.0 / np.linalg.eigvalsh(A).max()
    for _ in range(iters):
        s = np.maximum(s - lr * (A @ s - b), 0.0)
    return s


_SMITS_TARGETS = {
    "white": (1, 1, 1), "cyan": (0, 1, 1), "magenta": (1, 0, 1),
    "yellow": (1, 1, 0), "red": (1, 0, 0), "green": (0, 1, 0),
    "blue": (0, 0, 1),
}
_BASIS = {k: _smoothest_metamer(v) for k, v in _SMITS_TARGETS.items()}


def rgb_to_spectrum(rgb):
    """Promote RGB (...,3) reflectance/emission to (...,30) band values —
    Smits' combination: the minimum channel takes white, the remainder the
    matching secondary + primary (Smits 1999, 'An RGB to Spectrum Conversion
    for Reflectances'; pbrt RGBSpectrum::ToRGBSpectrum analog)."""
    rgb = np.asarray(rgb, np.float64)
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    w = {k: np.asarray(v) for k, v in _BASIS.items()}
    out = np.zeros(rgb.shape[:-1] + (N_BANDS,))
    done = np.zeros(rgb.shape[:-1], bool)
    cases = (
        ((r <= g) & (g <= b), r, g, b, "cyan", "blue"),
        ((r <= b) & (b <= g), r, b, g, "cyan", "green"),
        ((g <= r) & (r <= b), g, r, b, "magenta", "blue"),
        ((g <= b) & (b <= r), g, b, r, "magenta", "red"),
        ((b <= r) & (r <= g), b, r, g, "yellow", "green"),
        ((b <= g) & (g <= r), b, g, r, "yellow", "red"),
    )
    for mask, lo, mid, hi, sec, prim in cases:
        m = mask & ~done
        done |= m
        out[m] = (lo[m][..., None] * w["white"]
                  + (mid[m] - lo[m])[..., None] * w[sec]
                  + (hi[m] - mid[m])[..., None] * w[prim])
    return np.maximum(out, 0.0).astype(np.float32)


def spectrum_to_rgb(spec):
    """(...,30) band values -> linear sRGB via CIE integration."""
    return np.einsum("ck,...k->...c", SPEC_TO_RGB,
                     np.asarray(spec, np.float64)).astype(np.float32)


# ------------------------------------------------------------- band passes

def _promoted_sources(scene):
    """Promote every color-carrying table once. Gray triplets (the storage
    convention for float texture params) promote to ~flat spectra of the
    same value, so promoting the whole const table is value-preserving for
    them."""
    out = {}
    out["tex_const"] = rgb_to_spectrum(np.asarray(scene["tex_data"]["const"]))
    out["emit"] = rgb_to_spectrum(np.asarray(scene["lights"]["emit"]))
    out["images"] = tuple(rgb_to_spectrum(np.asarray(im))
                          for im in scene.get("images", ()))
    if scene.get("env_map") is not None:
        out["env_map"] = rgb_to_spectrum(np.asarray(scene["env_map"]))
    return out


def _band_scene(scene, src, g):
    """Scene with every color source replaced by bands [3g, 3g+3)."""
    sl = slice(3 * g, 3 * g + 3)
    s2 = dict(scene)
    s2["tex_data"] = dict(scene["tex_data"],
                          const=jnp.asarray(src["tex_const"][..., sl]))
    s2["lights"] = dict(scene["lights"],
                        emit=jnp.asarray(src["emit"][..., sl]))
    if src["images"]:
        s2["images"] = tuple(jnp.asarray(im[..., sl])
                             for im in src["images"])
        from ..shade.mipmap import build_pyramid, pack_pyramid
        s2["mipmaps"] = tuple(pack_pyramid(build_pyramid(im[..., sl]))
                              for im in src["images"])
    if "env_map" in src:
        s2["env_map"] = jnp.asarray(src["env_map"][..., sl])
    return s2


def render_spectral(scene, meta, cfg, spp=None, film=None):
    """Full 30-band spectral render: ten 3-band passes integrated to sRGB.

    Media and measured-BRDF tables stay in their RGB representation (their
    band promotion would follow the same recipe; documented coverage limit).
    Returns (rgb_image, band_films list)."""
    from ..engine.render import render
    src = _promoted_sources(scene)
    rgb = None
    films = []
    for g in range(N_BANDS // 3):
        img_g, film_g = render(_band_scene(scene, src, g), meta, cfg, spp=spp)
        films.append(film_g)
        Mg = jnp.asarray(SPEC_TO_RGB[:, 3 * g:3 * g + 3], jnp.float32)
        contrib = jnp.einsum("ck,yxk->yxc", Mg, img_g, precision="highest")
        rgb = contrib if rgb is None else rgb + contrib
    return rgb, films
