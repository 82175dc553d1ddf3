"""Metropolis light transport — pbrt src/renderers/metropolis.{h,cpp} redesigned
as batched primary-sample-space (Kelemen) MLT.

The reference runs nTasks chains on threads, each splatting into the shared film
with AtomicAdd (SURVEY §3.5). Here thousands of chains advance in lockstep as one
SPMD batch: the chain state is the primary-sample vector u ∈ [0,1)^D; a mutation
is either a LargeStep (fresh uniform vector) or Kelemen's exponential small step
(MutateValue, metropolis.cpp ~L120); path radiance is re-evaluated for the whole
batch; acceptance, Kelemen-weighted splats of both states, and the bootstrap
normalization b all follow the reference. Bidirectional path construction is
post-v1 (documented divergence — camera paths with per-vertex direct lighting).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core.vecmath import absdot, dot
from ..core import rng as rngmod
from ..core import montecarlo as mc
from ..core.spectrum import luminance
from ..kernels import intersect as isect
from ..shade import bsdf as bx
from ..shade import lights as lt
from ..shade import geometry as geom
from ..shade import materials as mtl
from ..shade.textures import eval_textures
from . import camera as cam
from . import film as flm

BIG = jnp.float32(1.0e7)

# u-vector layout: [img_x, img_y, lens_u, lens_v, time] + per-bounce block
_HDR = 5
_PB = 9   # light_sel, light_u, light_v, light_tri, mis_comp, mis_u, mis_v, bsdf_comp+dir(2) → 9


@dataclasses.dataclass(frozen=True)
class MLTConfig:
    max_depth: int = 5
    n_chains: int = 4096
    n_bootstrap: int = 4096
    mutations_per_wave: int = 16
    large_step_prob: float = 0.25
    small_step_s1: float = 1.0 / 1024.0
    small_step_s2: float = 1.0 / 16.0

    @property
    def dim(self):
        return _HDR + (self.max_depth + 1) * _PB


def _col(u, i):
    return u[:, i]


def eval_path(scene, meta, cfg: MLTConfig, u):
    """Path radiance for primary-sample vectors u (N,D).

    Returns (L (N,3), raster_x, raster_y). Mirrors the path integrator with
    samples drawn from u columns instead of the counter-based sampler."""
    n = u.shape[0]
    px = _col(u, 0) * meta.xres
    py = _col(u, 1) * meta.yres
    rays = cam.generate_rays(
        scene["camera"],
        jnp.floor(px).astype(jnp.int32), jnp.floor(py).astype(jnp.int32),
        px - jnp.floor(px), py - jnp.floor(py),
        _col(u, 2), _col(u, 3), _col(u, 4), meta.cam_kind)
    o, d = rays["o"], rays["d"]
    L = jnp.zeros((n, 3), jnp.float32)
    throughput = jnp.ones((n, 3), jnp.float32)
    active = jnp.ones((n,), jnp.bool_)
    spec = jnp.ones((n,), jnp.bool_)
    n_lights = meta.n_lights
    present = meta.lobe_types

    for bounce in range(cfg.max_depth + 1):
        base = _HDR + bounce * _PB
        hit = isect.intersect(scene, o, d,
                              jnp.where(active, BIG, 0.0) * jnp.ones((n,)))
        miss = hit["prim"] < 0
        L += jnp.where((active & miss & spec)[..., None],
                       throughput * lt.escaped_radiance(scene, d,
                                                        meta.light_types), 0.0)
        active = active & ~miss
        sg = geom.shading_geometry(scene, hit, o, d)
        tex_values = eval_textures(meta.tex_specs, scene["tex_data"], sg,
                                   scene.get("images", ()))
        lobes = mtl.gather_lobes(scene, sg, tex_values)
        wo_l = geom.world_to_local(sg, -d)
        if lt.AREA in meta.light_types:
            L += jnp.where((active & spec)[..., None],
                           throughput * lt.area_light_emitted(scene, sg, -d),
                           0.0)
        if n_lights > 0:
            lidx = jnp.minimum((_col(u, base) * n_lights).astype(jnp.int32),
                               n_lights - 1)
            ls = lt.sample_li(scene, lidx, sg["p"], _col(u, base + 1),
                              _col(u, base + 2), _col(u, base + 3),
                              meta.light_types, meta.light_image_rows)
            wi_l = geom.world_to_local(sg, ls["wi"])
            f_l = bx.bsdf_f(lobes, wo_l, wi_l, present, False)
            cos_l = absdot(ls["wi"], sg["ns"])
            ok = active & (ls["pdf"] > 0) & (cos_l > 0)
            occ = isect.intersect_p(
                scene, sg["p"] + ls["wi"] * sg["ray_eps"][..., None], ls["wi"],
                jnp.where(ok, ls["dist"] - 2 * sg["ray_eps"], 0.0))
            bpdf = bx.bsdf_pdf(lobes, wo_l, wi_l, present, False)
            w = jnp.where(ls["delta"], 1.0,
                          mc.power_heuristic(1.0, ls["pdf"], 1.0, bpdf))
            Ld = jnp.where((ok & ~occ)[..., None],
                           f_l * ls["radiance"]
                           * (cos_l * w * n_lights
                              / jnp.maximum(ls["pdf"], 1e-12))[..., None], 0.0)
            L += jnp.where(active[..., None], throughput * Ld, 0.0)

        if bounce == cfg.max_depth:
            break
        bs = bx.bsdf_sample(lobes, wo_l, _col(u, base + 4), _col(u, base + 5),
                            _col(u, base + 6), present, True)
        wi_w = geom.local_to_world(sg, bs["wi"])
        cosc = absdot(wi_w, sg["ns"])
        contrib = bs["f"] * (cosc / jnp.maximum(bs["pdf"], 1e-12))[..., None]
        ok = bs["valid"] & jnp.any(bs["f"] != 0, axis=-1)
        throughput = jnp.where(ok[..., None], throughput * contrib, throughput)
        active = active & ok
        spec = bs["specular"]
        o = sg["p"] + wi_w * sg["ray_eps"][..., None]
        d = wi_w

    L = jnp.where(jnp.isfinite(L), L, 0.0)
    return L, px, py


def _mutate(u, key_pix, step_idx, cfg: MLTConfig):
    """One Metropolis mutation for the batch: LargeStep or Kelemen small step."""
    n, D = u.shape
    samp = jnp.full((n,), step_idx, jnp.uint32)
    u_sel = rngmod.sample_1d(rngmod.SamplerConfig(kind=rngmod.RANDOM),
                             key_pix, samp, 999999)
    large = u_sel < cfg.large_step_prob

    cols = []
    for dcol in range(D):
        r1 = rngmod.sample_1d(rngmod.SamplerConfig(kind=rngmod.RANDOM),
                              key_pix, samp, 2 * dcol)
        r2 = rngmod.sample_1d(rngmod.SamplerConfig(kind=rngmod.RANDOM),
                              key_pix, samp, 2 * dcol + 1)
        # Kelemen MutateValue: exponential magnitude, random sign
        mag = cfg.small_step_s2 * jnp.exp(
            -jnp.log(cfg.small_step_s2 / cfg.small_step_s1) * r1)
        delta = jnp.where(r2 < 0.5, mag, -mag)
        small = (u[:, dcol] + delta) % 1.0
        cols.append(jnp.where(large, r1, small))
    return jnp.stack(cols, axis=1), large


def render_mlt(scene, meta, cfg: MLTConfig, n_waves=8, seed=0):
    """Full MLT render: bootstrap → chains → splat; returns (image, film)."""
    n = cfg.n_chains
    D = cfg.dim

    @jax.jit
    def bootstrap(seed_arr):
        pix = jnp.arange(cfg.n_bootstrap, dtype=jnp.uint32) ^ seed_arr[0]
        samp = jnp.zeros(cfg.n_bootstrap, jnp.uint32)
        u = jnp.stack([rngmod.sample_1d(
            rngmod.SamplerConfig(kind=rngmod.RANDOM), pix, samp, dcol)
            for dcol in range(D)], axis=1)
        Lb, _, _ = eval_path(scene, meta, cfg, u)
        y = luminance(Lb)
        b = jnp.mean(y)
        # resample chain starts proportional to y
        dist = mc.build_distribution_1d(jnp.maximum(y, 1e-12))
        u_pick = rngmod.sample_1d(rngmod.SamplerConfig(kind=rngmod.RANDOM),
                                  pix[:n], samp[:n], 777777)
        idx, _ = mc.sample_distribution_1d_discrete(dist, u_pick)
        return u[idx], b

    seeds = jnp.asarray([seed], jnp.uint32)
    u, b = bootstrap(seeds)

    film = flm.new_film(meta.xres, meta.yres)

    @jax.jit
    def wave(film, u, wave_idx):
        L_cur, px_c, py_c = eval_path(scene, meta, cfg, u)
        y_cur = luminance(L_cur)

        def step(carry, k):
            film, u, L_cur, y_cur = carry
            key_pix = (jnp.arange(n, dtype=jnp.uint32)
                       ^ (wave_idx * jnp.uint32(7919))
                       ^ (k * jnp.uint32(104729)))
            u_prop, large = _mutate(u, key_pix, k, cfg)
            L_prop, px_p, py_p = eval_path(scene, meta, cfg, u_prop)
            y_prop = luminance(L_prop)
            a = jnp.minimum(1.0, y_prop / jnp.maximum(y_cur, 1e-12))
            # Kelemen weighted splats of both states
            w_cur = (1.0 - a) / jnp.maximum(y_cur, 1e-12)
            w_prop = a / jnp.maximum(y_prop, 1e-12)
            px_c2 = _col(u, 0) * meta.xres
            py_c2 = _col(u, 1) * meta.yres
            film = flm.splat(film, px_c2, py_c2, L_cur * w_cur[..., None])
            film = flm.splat(film, px_p, py_p, L_prop * w_prop[..., None])
            # accept/reject
            u_acc = rngmod.sample_1d(rngmod.SamplerConfig(kind=rngmod.RANDOM),
                                     key_pix, jnp.full((n,), k, jnp.uint32),
                                     555555)
            accept = u_acc < a
            u_new = jnp.where(accept[:, None], u_prop, u)
            L_new = jnp.where(accept[:, None], L_prop, L_cur)
            y_new = jnp.where(accept, y_prop, y_cur)
            return (film, u_new, L_new, y_new), None

        (film, u, _, _), _ = jax.lax.scan(
            step, (film, u, L_cur, y_cur),
            jnp.arange(cfg.mutations_per_wave, dtype=jnp.uint32))
        return film, u

    total_mutations = 0
    for wv in range(n_waves):
        film, u = wave(film, u, jnp.uint32(wv))
        total_mutations += cfg.mutations_per_wave * n

    # splat normalization: E[image] = b · splat / n_mutations · n_pixels
    splat_scale = float(b) * meta.xres * meta.yres / total_mutations
    img = flm.develop(film, splat_scale=splat_scale)
    return img, film
