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
                aux=None, grid_chunk=None, tiled=False, band=None):
    """One sample-per-pixel wave: raygen → Li → film accumulate.

    pix: optional (N,) pixel ids to render (defaults to all); samp_idx scalar.
    mask: optional (N,) bool — lanes with False contribute nothing (used for
    padding when the pixel axis is sharded across devices).
    aux: integrator preprocessing output (photon map, SH probes...).
    grid_chunk: static int when pix is the full pixel grid tiled grid_chunk
    times (lane i ↔ pixel i % npix) — enables the dense film path.
    band: static (margin, band_tiled) when `film` is a device-local band
    (film.add_samples_band) and pix is the band's full pixel grid — the
    sharded render's dense film path (no scatters).
    """
    if pix is None:
        lane = jnp.arange(meta.xres * meta.yres, dtype=jnp.uint32)
        if flm.tiled_order(meta):
            # 8x16-tile pixel order: each 128-lane BVH sub-packet gets a
            # compact image footprint (SURVEY §2.10 P1 ray re-packing,
            # done statically — no per-wave sort)
            px_t, py_t = flm.lane_pixel(lane, meta.xres)
            pix = (py_t.astype(jnp.uint32) * meta.xres
                   + px_t.astype(jnp.uint32))
            tiled = True
        else:
            pix = lane
        if grid_chunk is None:
            grid_chunk = 1
    # samp_idx may be a scalar (one sample for every pixel) or a per-lane
    # array (multi-spp megawaves: pixels tiled × sample indices repeated)
    samp = jnp.broadcast_to(jnp.asarray(samp_idx, jnp.uint32), pix.shape)
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
    if band is not None:
        margin, band_tiled = band
        return flm.add_samples_band(film, meta.filter, sx, sy, L, None,
                                    margin, weight=w, tiled=band_tiled)
    if grid_chunk is not None:
        return flm.add_samples_grid(film, meta.filter, sx, sy, L, grid_chunk,
                                    weight=w, tiled=tiled)
    return flm.add_samples(film, meta.filter, sx, sy, L, weight=w)


@partial(jax.jit, static_argnums=(1, 2))
def _render_wave_jit(scene, meta, cfg, film, samp_idx, aux=None):
    return render_wave(scene, meta, cfg, film, samp_idx, aux=aux)


def _render_chunk(scene, meta, cfg, film, s0, chunk, aux=None):
    """One megawave: pixels × `chunk` consecutive sample indices starting at
    s0 — pix/samp built ON DEVICE (a host-built (N,) upload costs a ~130 ms
    tunnel round trip per launch on this platform)."""
    n_pix = meta.xres * meta.yres
    samp = jnp.repeat(jnp.asarray(s0, jnp.uint32)
                      + jnp.arange(chunk, dtype=jnp.uint32), n_pix)
    lane = jnp.arange(n_pix, dtype=jnp.uint32)
    if flm.tiled_order(meta):
        px_t, py_t = flm.lane_pixel(lane, meta.xres)
        wave_pix = py_t.astype(jnp.uint32) * meta.xres + px_t.astype(jnp.uint32)
        tiled = True
    else:
        wave_pix = lane
        tiled = False
    pix = jnp.tile(wave_pix, chunk)
    return render_wave(scene, meta, cfg, film, samp, pix=pix, aux=aux,
                       grid_chunk=chunk, tiled=tiled)


_render_chunk_jit = partial(jax.jit, static_argnums=(1, 2, 5))(_render_chunk)


@partial(jax.jit, static_argnums=(1, 2, 4, 5, 6))
def _render_fused_jit(scene, meta, cfg, film, spp, spp_chunk, start_wave,
                      aux=None):
    """Whole render in ONE dispatch: lax.fori_loop over megawaves with the
    film as carry. Counter-based sampling makes every wave a pure function of
    (pixel, sample) ids, so the loop carries no sampler state (SURVEY §2.10 P10)."""
    total = spp - start_wave
    n_full = total // spp_chunk

    def body(w, film):
        s0 = jnp.uint32(start_wave) + jnp.uint32(w) * jnp.uint32(spp_chunk)
        return _render_chunk(scene, meta, cfg, film, s0, spp_chunk, aux)

    film = jax.lax.fori_loop(0, n_full, body, film)
    rem = total - n_full * spp_chunk
    if rem:
        s0 = jnp.uint32(start_wave + n_full * spp_chunk)
        film = _render_chunk(scene, meta, cfg, film, s0, rem, aux)
    return film


@partial(jax.jit, static_argnums=(1, 2))
def _crop_wave_jit(scene, meta, cfg, film, pix, samp_idx, aux=None):
    return render_wave(scene, meta, cfg, film, samp_idx, pix=pix, aux=aux)


def _render_cropped(scene, meta, cfg, film, spp, start_wave, aux, progress):
    """Film crop window (image.cpp ctor: xPixelStart = ceil(xres*crop0) etc):
    render only the crop's pixel subset; the film stays full-resolution with
    zeros outside the window. Crop regions are small, so per-wave scatter
    accumulation (add_samples) is fine here."""
    import math as _m
    import numpy as np
    x0c, x1c, y0c, y1c = meta.crop
    x0 = int(_m.ceil(meta.xres * x0c))
    x1 = max(x0 + 1, int(_m.ceil(meta.xres * x1c)))
    y0 = int(_m.ceil(meta.yres * y0c))
    y1 = max(y0 + 1, int(_m.ceil(meta.yres * y1c)))
    xs, ys = np.meshgrid(np.arange(x0, x1), np.arange(y0, y1))
    pix = jnp.asarray((ys * meta.xres + xs).ravel().astype(np.uint32))
    for s in range(start_wave, spp):
        film = _crop_wave_jit(scene, meta, cfg, film, pix, jnp.uint32(s), aux)
        if progress is not None:
            progress(s + 1, spp)
    return flm.develop(film), film


@partial(jax.jit, static_argnums=(1, 2))
def _occupancy_probe_jit(scene, meta, cfg, samp_idx):
    lane = jnp.arange(meta.xres * meta.yres, dtype=jnp.uint32)
    if flm.tiled_order(meta):
        px_t, py_t = flm.lane_pixel(lane, meta.xres)
        pix = py_t.astype(jnp.uint32) * meta.xres + px_t.astype(jnp.uint32)
    else:
        pix = lane
    samp = jnp.broadcast_to(jnp.asarray(samp_idx, jnp.uint32), pix.shape)
    px = (pix % meta.xres).astype(jnp.int32)
    py = (pix // meta.xres).astype(jnp.int32)
    ufx, ufy = rngmod.sample_2d(meta.sampler, pix, samp, SLOT_FILM)
    ul1, ul2 = rngmod.sample_2d(meta.sampler, pix, samp, SLOT_LENS)
    ut = rngmod.sample_1d(meta.sampler, pix, samp, SLOT_TIME)
    rays = cam.generate_rays(scene["camera"], px, py, ufx, ufy, ul1, ul2, ut,
                             meta.cam_kind)
    _, occ = li(scene, meta, cfg, rays, pix, samp, with_stats=True)
    return occ


def occupancy_probe(scene, meta, cfg, samp_idx=0):
    """Per-bounce wavefront occupancy (SURVEY §5.1 — the #1 perf signal for a
    masked wavefront tracer; pbrt's PBRT_* counting-probes analog). Returns a
    list of active-lane fractions entering each bounce, or None for
    integrator kinds without the shared bounce loop."""
    if cfg.kind not in ("path", "direct", "whitted", "igi"):
        return None
    occ = _occupancy_probe_jit(scene, meta, cfg, jnp.uint32(samp_idx))
    n = meta.xres * meta.yres
    import numpy as np
    return [round(float(v) / n, 4) for v in np.asarray(occ)]


def auto_spp_chunk(meta, spp, target_rays=1 << 20):
    """Samples per megawave. TPU kernel dispatch has a fixed cost that dwarfs
    the per-ray work at small N (measured: 65k rays ≈ 3.3ms, 4M rays ≈ 6ms for
    the brute intersect), so waves batch as many samples as fit a ~1M-ray
    budget. The reference has no analog — its task grain (16×16 tiles,
    samplerrenderer.cpp) tunes for cache locality, not dispatch overhead."""
    n_pix = meta.xres * meta.yres
    return max(1, min(spp, target_rays // max(n_pix, 1)))


def render(scene, meta, cfg: IntegratorConfig, spp=None, film=None, start_wave=0,
           progress=None, checkpoint_path=None, checkpoint_every=0,
           metrics_path=None, spp_chunk=None):
    """Full render: spp waves accumulated into the film; returns (image, film).

    Checkpoint/resume: pass the previous film and start_wave (bitwise identical to
    an uninterrupted run thanks to counter-based sampling; SURVEY §5.4), or pass
    checkpoint_path — an existing file there is loaded and the render continues;
    every checkpoint_every waves the state is re-dumped atomically.
    metrics_path: optional JSONL observability sink (SURVEY §5.5): one record per
    wave with wall time and cumulative camera-rays/s.
    """
    spp = spp if spp is not None else meta.sampler.spp
    if checkpoint_path:
        import os
        from . import checkpoint as ckpt
        if os.path.exists(checkpoint_path):
            film, start_wave, _ = ckpt.load(checkpoint_path, meta, cfg)
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
    crop = tuple(getattr(meta, "crop", (0.0, 1.0, 0.0, 1.0)))
    if crop != (0.0, 1.0, 0.0, 1.0):
        img, film = _render_cropped(scene, meta, cfg, film, spp, start_wave,
                                    aux, progress)
        return img, film
    if spp_chunk is None:
        spp_chunk = auto_spp_chunk(meta, spp)
    import time as _time
    t0 = _time.perf_counter()
    rays_done = 0
    if metrics_path:
        # one occupancy probe per render: per-bounce active-lane fractions
        # (SURVEY §5.1) so perf work can see where the wavefront goes dark
        occ = occupancy_probe(scene, meta, cfg, samp_idx=start_wave)
        if occ is not None:
            import json
            with open(metrics_path, "a") as f:
                f.write(json.dumps({"occupancy_per_bounce": occ}) + "\n")
    # fast path: no per-wave host callbacks → the whole render is ONE jitted
    # dispatch (lax.fori_loop over megawaves); per-launch tunnel latency on
    # this platform is ~130 ms, so launch count dominates small renders
    if (progress is None and not checkpoint_path and not metrics_path
            and start_wave < spp):
        film = _render_fused_jit(scene, meta, cfg, film, spp, spp_chunk,
                                 start_wave, aux)
        img = flm.develop(film)
        return img, film
    s = start_wave
    while s < spp:
        chunk = min(spp_chunk, spp - s)
        if chunk == 1:
            film = _render_wave_jit(scene, meta, cfg, film, jnp.uint32(s), aux)
        else:
            # megawave: every pixel × chunk consecutive sample indices in one
            # launch (counter-based RNG keeps each (pixel, s) draw identical
            # to the one-wave-at-a-time schedule)
            film = _render_chunk_jit(scene, meta, cfg, film, jnp.uint32(s),
                                     chunk, aux)
        s += chunk
        if progress is not None:
            progress(s, spp)
        if checkpoint_path and checkpoint_every and \
                s % checkpoint_every < chunk and s < spp:
            from . import checkpoint as ckpt
            jax.block_until_ready(film)
            ckpt.save(checkpoint_path, film, s, meta, cfg)
        if metrics_path:
            jax.block_until_ready(film)
            rays_done += meta.xres * meta.yres * chunk
            dt = _time.perf_counter() - t0
            import json
            with open(metrics_path, "a") as f:
                f.write(json.dumps({
                    "wave": s, "spp": spp, "wall_s": round(dt, 3),
                    "camera_rays": rays_done,
                    "camera_rays_per_sec": round(rays_done / max(dt, 1e-9), 1),
                }) + "\n")
    if checkpoint_path:
        import os
        if os.path.exists(checkpoint_path):
            os.remove(checkpoint_path)   # completed: a stale file would make a
            # re-run resume mid-way instead of rendering fresh
    img = flm.develop(film)
    return img, film


def render_adaptive(scene, meta, cfg: IntegratorConfig, min_spp=4, max_spp=32,
                    threshold=0.02, progress=None):
    """Adaptive sampling — pbrt src/samplers/adaptive.{h,cpp} re-shaped for SPMD.

    The reference's AdaptiveSampler re-issues a pixel's samples at maxsamples
    when a contrast criterion fires (ReportResults). A per-pixel immediate
    retry is hostile to SPMD, so the wavefront version is a *between-wave
    re-queue* (SURVEY §2.8 TPU equiv): render min_spp full waves split across
    two half-buffers, then repeatedly flag pixels whose A/B relative contrast
    exceeds `threshold` and render further waves for only the flagged pixel
    subset (compacted + padded to a pow2 capacity so jit shapes stay static).
    Sample positions remain the counter-based sequence, so the result equals a
    plain render at the per-pixel achieved spp.

    Returns (image, (film_a, film_b, spp_map)).
    """
    import numpy as np
    film_a = flm.new_film(meta.xres, meta.yres)
    film_b = flm.new_film(meta.xres, meta.yres)
    for s in range(min_spp):
        if s % 2 == 0:
            film_a = _render_wave_jit(scene, meta, cfg, film_a, jnp.uint32(s))
        else:
            film_b = _render_wave_jit(scene, meta, cfg, film_b, jnp.uint32(s))
        if progress is not None:
            progress(s + 1, max_spp)

    n_pix = meta.xres * meta.yres
    spp_map = np.full((n_pix,), min_spp, np.int32)

    @jax.jit
    def _subset_wave(scene, film, pix, mask, samp_idx):
        return render_wave(scene, meta, cfg, film, samp_idx, pix=pix, mask=mask)

    s = min_spp
    while s < max_spp:
        # contrast criterion between the two half-buffer estimates
        # (adaptive.cpp needsSupersampling: contrast of samples vs mean)
        a = np.asarray(flm.develop(film_a))
        b = np.asarray(flm.develop(film_b))
        lum_a = a @ np.array([0.212671, 0.715160, 0.072169], np.float32)
        lum_b = b @ np.array([0.212671, 0.715160, 0.072169], np.float32)
        err = np.abs(lum_a - lum_b) / np.maximum(0.5 * (lum_a + lum_b), 1e-3)
        flagged = np.nonzero((err.reshape(-1) > threshold)
                             & (spp_map < max_spp))[0]
        if flagged.size == 0:
            break
        cap = max(256, 1 << int(np.ceil(np.log2(flagged.size))))
        pix = np.zeros((cap,), np.uint32)
        pix[:flagged.size] = flagged
        mask = np.zeros((cap,), bool)
        mask[:flagged.size] = True
        pix_j = jnp.asarray(pix)
        mask_j = jnp.asarray(mask)
        if s % 2 == 0:
            film_a = _subset_wave(scene, film_a, pix_j, mask_j, jnp.uint32(s))
        else:
            film_b = _subset_wave(scene, film_b, pix_j, mask_j, jnp.uint32(s))
        spp_map[flagged] += 1
        s += 1
        if progress is not None:
            progress(s, max_spp)

    film = flm.merge([film_a, film_b])
    img = flm.develop(film)
    return img, (film_a, film_b, spp_map.reshape(meta.yres, meta.xres))
