"""Multi-chip distribution — the TPU-native replacement for pbrt's thread pool
(src/core/parallel.{h,cpp}) and atomic film merging (SURVEY §2.10 P1/P2/P7).

Pixels/samples shard across the device mesh via shard_map (DP axis); the scene
pytree is replicated; each device accumulates its own functional film and the
merge is one psum — no atomics, no mutexes, deterministic. Gradients of scene
parameters psum the same way (P7), letting XLA overlap the all-reduce with the
remaining backward work.

Multi-host: jax.distributed.initialize() before mesh creation gives the same code
path over ICI+DCN; every host runs the same program (SURVEY §5.8).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..engine import film as flm
from ..engine.render import render_wave
from ..engine.integrator import IntegratorConfig


def maybe_init_distributed():
    """jax.distributed.initialize() when launched as one process of a
    multi-host job (SURVEY §5.8): explicit COORDINATOR_ADDRESS env (with
    NUM_PROCESSES/PROCESS_ID), or GRAIL_DIST=1 for TPU-pod auto-detection.
    Safe to call repeatedly; a no-op for single-process runs."""
    import os
    if getattr(maybe_init_distributed, "_done", False):
        return False
    maybe_init_distributed._done = True
    if os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize(
            coordinator_address=os.environ["COORDINATOR_ADDRESS"],
            num_processes=int(os.environ.get("NUM_PROCESSES", "1")),
            process_id=int(os.environ.get("PROCESS_ID", "0")))
        return True
    if os.environ.get("GRAIL_DIST") == "1":
        jax.distributed.initialize()   # TPU pod auto-detection
        return True
    return False


def make_mesh(n_devices=None, devices=None):
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), ("dev",))


def _pad_pixels(n_pixels, n_dev):
    per = -(-n_pixels // n_dev)
    return per * n_dev, per


def _band_layout(meta, n_dev):
    """Row-band decomposition of the film for the dense sharded film path.

    Each device owns `rows` consecutive pixel rows (padded so n_dev*rows >=
    yres; tiled 8x16 lane order inside the band when it divides evenly) plus
    `margin` filter-spill rows each side. Returns (rows, margin, tiled)."""
    import math as _m
    margin = int(_m.floor(meta.filter.ywidth + 0.5))
    rows = -(-meta.yres // n_dev)
    tiled = meta.xres % flm.TILE_W == 0
    if tiled:
        rows = -(-rows // flm.TILE_H) * flm.TILE_H
    return rows, margin, tiled


def _band_pixels(meta, n_dev):
    """Global pixel ids (band-major lane order) + validity for all devices."""
    rows, margin, tiled = _band_layout(meta, n_dev)
    lane = jnp.arange(rows * meta.xres, dtype=jnp.uint32)
    if tiled:
        px, py_local = flm.lane_pixel(lane, meta.xres)
    else:
        px = (lane % meta.xres).astype(jnp.int32)
        py_local = (lane // meta.xres).astype(jnp.int32)
    dev = jnp.arange(n_dev, dtype=jnp.int32)[:, None]
    py = dev * rows + py_local[None, :]                      # (n_dev, R*W)
    valid = (py < meta.yres).reshape(-1)
    pix = (jnp.minimum(py, meta.yres - 1) * meta.xres
           + px[None, :]).astype(jnp.uint32).reshape(-1)
    return pix, valid, rows, margin, tiled


def _band_to_film(band, film, rows, margin, n_dev):
    """Place this device's band into the padded global film, psum across the
    mesh (P2 — the only collective), crop, and add into `film`."""
    k = jax.lax.axis_index("dev")
    yres, xres = film["weight"].shape

    def place(x):
        full = jnp.zeros((n_dev * rows + 2 * margin,) + x.shape[1:], x.dtype)
        full = jax.lax.dynamic_update_slice(
            full, x, (k * rows,) + (0,) * (x.ndim - 1))
        full = jax.lax.psum(full, "dev")
        return full[margin:margin + yres]

    return jax.tree.map(lambda a, b: a + place(b), film, band)


def render_wave_sharded(scene, meta, cfg, film, samp_idx, mesh, aux=None):
    """One wave with pixel rows sharded over mesh axis 'dev'.

    Film accumulation is the dense band path (film.add_samples_band): each
    device accumulates its own rows locally with shifted dense adds — no
    scatters (XLA:TPU serializes colliding scatters; measured 271 ms/Mray vs
    <1 ms dense) — then places its band into the padded global film for one
    psum."""
    n_dev = mesh.devices.size
    pix, valid, rows, margin, tiled = _band_pixels(meta, n_dev)

    def shard_fn(scene, film, pix_shard, valid_shard, samp, aux):
        band = flm.new_band_film(rows, meta.xres, margin)
        band = render_wave(scene, meta, cfg, band, samp[0], pix=pix_shard,
                           mask=valid_shard, aux=aux, band=(margin, tiled))
        return _band_to_film(band, film, rows, margin, n_dev)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("dev"), P("dev"), P(), P()),
        out_specs=P(), check_vma=False,
    )
    samp = jnp.full((1,), samp_idx, jnp.uint32)
    return fn(scene, film, pix, valid, samp, aux)


def _render_all_sharded(scene, meta, cfg, film, spp, mesh, aux=None):
    """Whole sharded render in ONE dispatch: each device runs a fori_loop over
    its row-band's spp waves into a device-local band film (dense adds, no
    scatters), then ONE psum merges (P2) — no per-wave launches or
    collectives."""
    n_dev = mesh.devices.size
    pix, valid, rows, margin, tiled = _band_pixels(meta, n_dev)

    def shard_fn(scene, film, pix_shard, valid_shard, aux):
        def body(s, band):
            return render_wave(scene, meta, cfg, band, jnp.uint32(s),
                               pix=pix_shard, mask=valid_shard, aux=aux,
                               band=(margin, tiled))
        band = jax.lax.fori_loop(
            0, spp, body, flm.new_band_film(rows, meta.xres, margin))
        return _band_to_film(band, film, rows, margin, n_dev)

    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P("dev"), P("dev"), P()),
        out_specs=P(), check_vma=False,
    )
    return fn(scene, film, pix, valid, aux)


_render_all_sharded_jit = partial(jax.jit, static_argnums=(1, 2, 4, 5))(
    _render_all_sharded)


def render_sharded(scene, meta, cfg: IntegratorConfig, spp, mesh, film=None,
                   fused=True):
    """Sharded render. fused=True: one dispatch for the whole render (the
    production path); fused=False keeps the one-launch-per-wave loop (useful
    for per-wave progress/checkpointing)."""
    if film is None:
        film = flm.new_film(meta.xres, meta.yres)
    aux = _preprocess_aux(scene, meta, cfg, mesh=mesh)
    if fused:
        film = _render_all_sharded_jit(scene, meta, cfg, film, spp, mesh, aux)
        return flm.develop(film), film
    step = jax.jit(
        partial(render_wave_sharded, mesh=mesh),
        static_argnums=(1, 2))
    for s in range(spp):
        film = step(scene, meta, cfg, film, jnp.uint32(s), aux=aux)
    return flm.develop(film), film


def render_scene_sharded(scene, meta, cfg: IntegratorConfig, spp, mesh,
                         film=None, stream=False):
    """P6 scene sharding (SURVEY §2.10 P6 / §5.7): triangles partitioned
    spatially across the mesh — no device holds the whole mesh — with pixel
    rows sharded over the SAME axis. Every traversal inside the bounce loop
    ring-passes the resident ray queue with ppermute (dist/scene_shard.py);
    shading runs from the carried per-hit triangle record; area lights sample
    the compact light-tri table. The image is bitwise identical to the
    replicated render (same counter-based RNG, same Möller-Trumbore, ties
    broken by global id).

    Prefer this over the replicated `render_sharded` ONLY when the scene
    exceeds one chip's HBM (geometry memory per device is O(T/n_dev) here,
    but every device does a full pass over the ray queue per shard — the
    replicated path is faster whenever the scene fits)."""
    from .scene_shard import partition_scene
    if film is None:
        film = flm.new_film(meta.xres, meta.yres)
    if scene.get("inst") is not None or scene.get("media") is not None \
            or getattr(meta, "alpha_rows", ()):
        raise NotImplementedError(
            "ring mode supports plain triangle scenes (no instances/media/"
            "alpha) — use render_sharded")
    import dataclasses
    # wavefront compaction branches on a per-device lane count; its two cond
    # branches would execute DIFFERENT ppermute sequences per device in ring
    # mode (collective mismatch) — disable it here
    cfg = dataclasses.replace(cfg, compact=False)
    n_dev = mesh.devices.size
    ring = partition_scene(scene, n_dev, stream=stream)
    mesh_keys = ("verts", "vnorm", "vuv", "tri_idx", "tri_mat", "tri_light",
                 "tri_flags", "tri_alpha", "bvh")
    base = {k: v for k, v in scene.items() if k not in mesh_keys}
    base["ring"] = ring
    pix, valid, rows, margin, tiled = _band_pixels(meta, n_dev)

    def shard_fn(scene_rep, ring_shard, film, pix_shard, valid_shard):
        local = dict(scene_rep)
        local["ring"] = {k: v[0] for k, v in ring_shard.items()}

        def body(s, band):
            return render_wave(local, meta, cfg, band, jnp.uint32(s),
                               pix=pix_shard, mask=valid_shard,
                               band=(margin, tiled))
        band = jax.lax.fori_loop(
            0, spp, body, flm.new_band_film(rows, meta.xres, margin))
        return _band_to_film(band, film, rows, margin, n_dev)

    scene_rep = {k: v for k, v in base.items() if k != "ring"}
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P("dev"), P(), P("dev"), P("dev")),
        out_specs=P(), check_vma=False,
    )
    film = jax.jit(fn)(scene_rep, ring, film, pix, valid)
    return flm.develop(film), film


def _preprocess_aux(scene, meta, cfg, mesh=None):
    """Integrator preprocessing (photon shooting, VPLs, probes, dipole).

    With a mesh, photon shooting fans out across the devices (SURVEY §2.10
    P3, PhotonShootingTask analog): each device shoots a disjoint slice of
    the counter stream inside shard_map and the all_gathered grid is bitwise
    identical to the replicated shoot (tests/test_sharding.py). Other
    preprocesses still run replicated (their cost is negligible at current
    scales; same fan-out recipe applies)."""
    if cfg.kind == "photon":
        from ..engine.photonmap import (shoot_photons, shoot_photons_sharded,
                                        PhotonConfig)
        pcfg = PhotonConfig(n_paths=cfg.photon_paths,
                            radius=cfg.photon_radius,
                            final_gather=cfg.photon_final_gather)
        if mesh is not None and mesh.devices.size > 1 \
                and pcfg.n_paths % mesh.devices.size == 0:
            fn = shard_map(
                lambda s: shoot_photons_sharded(s, meta, pcfg),
                mesh=mesh, in_specs=(P(),), out_specs=P(), check_vma=False)
            return jax.jit(fn)(scene)
        return jax.jit(shoot_photons, static_argnums=(1, 2))(scene, meta, pcfg)
    if cfg.kind in ("diffuseprt", "glossyprt"):
        from ..engine.prt import prt_preprocess
        return jax.jit(prt_preprocess, static_argnums=(1, 2))(scene, meta, cfg)
    if cfg.kind == "useprobes":
        from ..engine.prt import read_probes, bake_probes
        if cfg.probes_file:
            return {"probes": read_probes(cfg.probes_file)}
        return {"probes": bake_probes(scene, meta, cfg, *cfg.probes_res,
                                      n_samples=cfg.prt_nsamples)}
    if cfg.kind == "dipole":
        from ..engine.subsurface import dipole_preprocess
        return dipole_preprocess(scene, meta, cfg)
    if cfg.kind == "irradiancecache":
        from ..engine.irradiance import irradiance_preprocess
        return irradiance_preprocess(scene, meta, cfg)
    return None


def make_train_step(meta, cfg, mesh, param_paths=("tex_data",)):
    """Build a jitted SPMD training step: render a wave, L2 loss vs target image,
    grads for the scene's differentiable leaves psum'd across the mesh.

    Returns step(scene, target, samp_idx) -> (loss, grads_pytree). The inverse
    rendering driver (tools/optimize.py) and dryrun_multichip use this.
    """
    n_pix = meta.xres * meta.yres
    n_dev = mesh.devices.size
    padded, _ = _pad_pixels(n_pix, n_dev)

    def loss_fn(params, scene, target, pix_shard, valid_shard, samp):
        scene = {**scene, **params}
        f = flm.new_film(meta.xres, meta.yres)
        f = render_wave(scene, meta, cfg, f, samp[0], pix=pix_shard,
                        mask=valid_shard)
        f = jax.tree.map(lambda a: jax.lax.psum(a, "dev"), f)
        img = flm.develop(f)
        return jnp.mean((img - target) ** 2)

    def shard_fn(params, scene, target, pix, valid, samp):
        loss, grads = jax.value_and_grad(loss_fn)(params, scene, target, pix,
                                                  valid, samp)
        grads = jax.lax.pmean(grads, "dev")  # identical but explicit (P7)
        return loss, grads

    smapped = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(), P(), P(), P("dev"), P("dev"), P()),
        out_specs=(P(), P()), check_vma=False,
    )

    @jax.jit
    def step(scene, target, samp_idx):
        params = {k: scene[k] for k in param_paths}
        rest = {k: v for k, v in scene.items() if k not in param_paths}
        pix = jnp.arange(padded, dtype=jnp.uint32)
        valid = pix < n_pix
        pix = jnp.where(valid, pix, 0)
        samp = jnp.full((1,), samp_idx, jnp.uint32)
        return smapped(params, rest, target, pix, valid, samp)

    return step
