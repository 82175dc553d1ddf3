"""Fine-grained profile of estimate_direct + shade_context sub-stages."""
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(name, fn, *args, iters=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    c = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:42s} {dt * 1e3:9.3f} ms   (compile {c:.1f}s)")
    return dt


def main():
    n = 1 << 20
    from grail.scene.presets import cornell_box
    from grail.engine.integrator import _shade_context, _pick_light, IntegratorConfig
    from grail.engine import camera as cam
    from grail.kernels import intersect as isect
    from grail.core import rng as rngmod
    from grail.core import montecarlo as mc
    from grail.shade import bsdf as bx
    from grail.shade import lights as lt
    from grail.shade import geometry as geom
    from grail.shade.textures import eval_textures
    from grail.shade import materials as mtl

    res = int(np.sqrt(n))
    scene, meta, _ = cornell_box(xres=res, yres=res, spp=4)
    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros(n, jnp.uint32)

    @jax.jit
    def raygen(pix, samp):
        px = (pix % meta.xres).astype(jnp.int32)
        py = (pix // meta.xres).astype(jnp.int32)
        ufx, ufy = rngmod.sample_2d(meta.sampler, pix, samp, 0)
        ul1, ul2 = rngmod.sample_2d(meta.sampler, pix, samp, 1)
        ut = rngmod.sample_1d(meta.sampler, pix, samp, 2)
        return cam.generate_rays(scene["camera"], px, py, ufx, ufy, ul1, ul2,
                                 ut, meta.cam_kind)
    rays = jax.block_until_ready(raygen(pix, samp))
    o, d = rays["o"], rays["d"]
    tmax = jnp.full((n,), 1e7, jnp.float32)
    close = jax.jit(lambda o, d, tmax: isect.intersect(scene, o, d, tmax))
    hit = jax.block_until_ready(close(o, d, tmax))

    # ---- shade context pieces
    sgf = jax.jit(lambda hit, o, d: geom.shading_geometry(scene, hit, o, d))
    timeit("shading_geometry", sgf, hit, o, d)
    sg = jax.block_until_ready(sgf(hit, o, d))

    texf = jax.jit(lambda sg: eval_textures(meta.tex_specs, scene["tex_data"],
                                            sg, scene.get("images", ()),
                                            scene.get("mipmaps", ())))
    timeit("eval_textures", texf, sg)
    tex_values = jax.block_until_ready(texf(sg))

    lobf = jax.jit(lambda sg, tv: mtl.gather_lobes(scene, sg, tv))
    timeit("gather_lobes", lobf, sg, tex_values)
    lobes = jax.block_until_ready(lobf(sg, tex_values))
    w2l = jax.jit(lambda sg, d: geom.world_to_local(sg, -d))
    timeit("world_to_local", w2l, sg, d)
    wo_local = jax.block_until_ready(w2l(sg, d))

    # ---- estimate_direct pieces
    cfg = IntegratorConfig(kind="path", max_depth=5)
    active = jnp.ones((n,), bool)

    @jax.jit
    def pick(pix, samp):
        return _pick_light(scene, meta, cfg, pix, samp, 0, active)
    lidx, pmf = jax.block_until_ready(pick(pix, samp))

    u2d = rngmod.sample_2d(meta.sampler, pix, samp, 10)
    u3 = rngmod.sample_1d(meta.sampler, pix, samp, 11)
    ucomp = rngmod.sample_1d(meta.sampler, pix, samp, 12)
    udir = rngmod.sample_2d(meta.sampler, pix, samp, 13)
    u2d = jax.block_until_ready(u2d)

    slif = jax.jit(lambda lidx, p, u1, u2, u3: lt.sample_li(
        scene, lidx, p, u1, u2, u3, meta.light_types))
    timeit("sample_li", slif, lidx, sg["p"], u2d[0], u2d[1], u3)
    ls = jax.block_until_ready(slif(lidx, sg["p"], u2d[0], u2d[1], u3))

    ssr = jax.jit(lambda lights_acdf, lidx, u3: mc.searchsorted_rows(
        lights_acdf, lidx, u3))
    timeit("  searchsorted_rows (acdf)", ssr, scene["lights"]["acdf"], lidx, u3)

    bf = jax.jit(lambda lobes, wo, wi: bx.bsdf_f(lobes, wo, wi,
                                                 meta.lobe_types, False))
    wi_l = jax.block_until_ready(jax.jit(
        lambda sg, wi: geom.world_to_local(sg, wi))(sg, ls["wi"]))
    timeit("bsdf_f", bf, lobes, wo_local, wi_l)
    bp = jax.jit(lambda lobes, wo, wi: bx.bsdf_pdf(lobes, wo, wi,
                                                   meta.lobe_types, False))
    timeit("bsdf_pdf", bp, lobes, wo_local, wi_l)

    ip = jax.jit(lambda p, wi, t: isect.intersect_p(scene, p, wi, t))
    timeit("intersect_p shadow", ip, sg["p"], ls["wi"], ls["dist"])

    bs_f = jax.jit(lambda lobes, wo, u1, u2, uc: bx.bsdf_sample(
        lobes, wo, u1, u2, uc, meta.lobe_types, include_specular=False))
    timeit("bsdf_sample", bs_f, lobes, wo_local, udir[0], udir[1], ucomp)
    bs = jax.block_until_ready(bs_f(lobes, wo_local, udir[0], udir[1], ucomp))

    l2wf = jax.jit(lambda sg, wi: geom.local_to_world(sg, wi))
    wi_w = jax.block_until_ready(l2wf(sg, bs["wi"]))
    hit2 = jax.block_until_ready(close(sg["p"], wi_w, tmax))

    hgf = jax.jit(lambda hit2: geom.hit_geometric(scene, hit2))
    timeit("hit_geometric", hgf, hit2)
    hg2 = jax.block_until_ready(hgf(hit2))

    alpf = jax.jit(lambda lidx, t, c: lt.area_light_pdf_dir(scene, lidx, t, c))
    from grail.core.vecmath import dot
    cosl = jax.block_until_ready(jax.jit(lambda hg, w: dot(hg["ng"], -w))(hg2, wi_w))
    timeit("area_light_pdf_dir", alpf, lidx, hit2["t"], cosl)
    alef = jax.jit(lambda hg, w: lt.area_light_emitted(scene, hg, w))
    timeit("area_light_emitted", alef, hg2, -wi_w)

    glf = jax.jit(lambda prim: scene["tri_light"][jnp.maximum(prim, 0)])
    timeit("tri_light gather", glf, hit2["prim"])


if __name__ == "__main__":
    main()
