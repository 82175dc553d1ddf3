"""Render orchestration — the SamplerRenderer analog (pbrt
src/renderers/samplerrenderer.cpp), re-shaped for SPMD.

The reference fans pixel-tile tasks over threads; here one render *wave* = one
sample per pixel for the whole image, fully vectorized and jitted. spp waves run in
sequence (the GetMoreSamples batching analog, bounding in-flight queue memory), each
accumulating into the functional film. Multi-chip: dist/sharding.py shards the pixel
axis over the mesh and psums the film.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..core import rng as rngmod
from . import camera as cam
from . import film as flm
from .integrator import IntegratorConfig, li, SLOT_FILM, SLOT_LENS, SLOT_TIME


def render_wave(scene, meta, cfg, film, samp_idx, pix=None, mask=None,
                aux=None):
    """One sample-per-pixel wave: raygen → Li → film accumulate.

    pix: optional (N,) pixel ids to render (defaults to all); samp_idx scalar.
    mask: optional (N,) bool — lanes with False contribute nothing (used for
    padding when the pixel axis is sharded across devices).
    aux: integrator preprocessing output (photon map, SH probes...).
    """
    if pix is None:
        pix = jnp.arange(meta.xres * meta.yres, dtype=jnp.uint32)
    samp = jnp.full(pix.shape, samp_idx, jnp.uint32)
    px = (pix % meta.xres).astype(jnp.int32)
    py = (pix // meta.xres).astype(jnp.int32)

    ufx, ufy = rngmod.sample_2d(meta.sampler, pix, samp, SLOT_FILM)
    ul1, ul2 = rngmod.sample_2d(meta.sampler, pix, samp, SLOT_LENS)
    ut = rngmod.sample_1d(meta.sampler, pix, samp, SLOT_TIME)

    rays = cam.generate_rays(scene["camera"], px, py, ufx, ufy, ul1, ul2, ut,
                             meta.cam_kind)
    if getattr(meta, "n_images", 0) > 0:
        # camera differential rays (Camera::GenerateRayDifferential: the same
        # sample shifted one pixel in x and in y) for texture filtering
        rx = cam.generate_rays(scene["camera"], px + 1, py, ufx, ufy,
                               ul1, ul2, ut, meta.cam_kind)
        ry = cam.generate_rays(scene["camera"], px, py + 1, ufx, ufy,
                               ul1, ul2, ut, meta.cam_kind)
        rays["camdiff"] = (rx["o"], rx["d"], ry["o"], ry["d"])
    if cfg.kind == "photon":
        from .photonmap import photon_li, PhotonConfig
        pcfg = PhotonConfig(n_paths=cfg.photon_paths, radius=cfg.photon_radius,
                            final_gather=cfg.photon_final_gather)
        L = photon_li(scene, meta, pcfg, cfg, rays, pix, samp, aux)
    elif cfg.kind == "diffuseprt":
        from .prt import diffuseprt_li
        L = diffuseprt_li(scene, meta, cfg, rays, pix, samp, aux)
    elif cfg.kind == "glossyprt":
        from .prt import glossyprt_li
        L = glossyprt_li(scene, meta, cfg, rays, pix, samp, aux)
    elif cfg.kind == "useprobes":
        from .prt import useprobes_li
        L = useprobes_li(scene, meta, cfg, rays, pix, samp, aux)
    elif cfg.kind == "irradiancecache":
        from .irradiance import irradiancecache_li
        L = irradiancecache_li(scene, meta, cfg, rays, pix, samp, aux)
    elif cfg.kind == "dipole":
        from .subsurface import dipole_li
        L = dipole_li(scene, meta, cfg, rays, pix, samp, aux)
    else:
        L = li(scene, meta, cfg, rays, pix, samp)
    # NaN/Inf quarantine (samplerrenderer.cpp ::Run checks) — drop bad samples
    bad = jnp.any(~jnp.isfinite(L), axis=-1)
    L = jnp.where(bad[..., None], 0.0, L)

    sx = px.astype(jnp.float32) + ufx
    sy = py.astype(jnp.float32) + ufy
    w = None if mask is None else mask.astype(jnp.float32)
    return flm.add_samples(film, meta.filter, sx, sy, L, weight=w)


@partial(jax.jit, static_argnums=(1, 2))
def _render_wave_jit(scene, meta, cfg, film, samp_idx, aux=None):
    return render_wave(scene, meta, cfg, film, samp_idx, aux=aux)


def render(scene, meta, cfg: IntegratorConfig, spp=None, film=None, start_wave=0,
           progress=None):
    """Full render: spp waves accumulated into the film; returns (image, film).

    Checkpoint/resume: pass the previous film and start_wave (bitwise identical to
    an uninterrupted run thanks to counter-based sampling; SURVEY §5.4)."""
    spp = spp if spp is not None else meta.sampler.spp
    if film is None:
        film = flm.new_film(meta.xres, meta.yres)
    aux = None
    if cfg.kind == "photon":
        from .photonmap import shoot_photons, PhotonConfig
        pcfg = PhotonConfig(n_paths=cfg.photon_paths, radius=cfg.photon_radius,
                            final_gather=cfg.photon_final_gather)
        aux = jax.jit(shoot_photons, static_argnums=(1, 2))(scene, meta, pcfg)
    elif cfg.kind in ("diffuseprt", "glossyprt"):
        from .prt import prt_preprocess
        aux = jax.jit(prt_preprocess, static_argnums=(1, 2))(scene, meta, cfg)
    elif cfg.kind == "useprobes":
        from .prt import read_probes, bake_probes
        if cfg.probes_file:
            aux = {"probes": read_probes(cfg.probes_file)}
        else:   # bake in-line when no file is given (createprobes fused)
            aux = {"probes": bake_probes(scene, meta, cfg, *cfg.probes_res,
                                         n_samples=cfg.prt_nsamples)}
    elif cfg.kind == "dipole":
        from .subsurface import dipole_preprocess
        aux = dipole_preprocess(scene, meta, cfg)
    elif cfg.kind == "irradiancecache":
        from .irradiance import irradiance_preprocess
        aux = irradiance_preprocess(scene, meta, cfg)
    for s in range(start_wave, spp):
        film = _render_wave_jit(scene, meta, cfg, film, jnp.uint32(s), aux)
        if progress is not None:
            progress(s + 1, spp)
    img = flm.develop(film)
    return img, film
