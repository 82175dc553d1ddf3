"""Micro-benchmarks of the wavefront stages on the current backend.

Times each stage separately so optimization effort goes where the time is:
raygen, intersect (brute + BVH packet), shade context, BSDF sample/eval,
estimate_direct, film scatter, full direct/path waves.

Every jitted stage takes its arrays as *traced arguments* (closing over a
device array bakes it into the HLO as a constant and XLA constant-folds
megabyte tensors at compile time — measured 130s compile for raygen alone).

Usage: python benchmarks/micro.py [n_rays_log2] [--json out.json]
"""
import json
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

RESULTS = {}


def timeit(name, fn, *args, iters=20, n_rays=None):
    try:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
    except Exception as e:     # noqa: BLE001 — a faulted tunnel must not
        # erase the rows already measured; record the error and continue
        # (the wedged-client caveat in bench.py applies: later rows in this
        # process will likely also fail)
        print(f"{name:36s} FAILED: {str(e)[:120]}")
        RESULTS[name] = {"error": str(e)[:200]}
        return 1.0
    rate = f"  {n_rays / dt / 1e6:9.1f} Mrays/s" if n_rays else ""
    print(f"{name:36s} {dt * 1e3:9.3f} ms{rate}   (compile {compile_s:.1f}s)")
    RESULTS[name] = {"ms": dt * 1e3,
                     "mrays_per_s": (n_rays / dt / 1e6) if n_rays else None}
    return dt


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    n = 1 << n_log2
    print(f"backend={jax.default_backend()} n_rays={n}")

    from grail.scene.presets import cornell_box, tessellate_sphere
    from grail.engine.render import render_wave
    from grail.engine.integrator import (IntegratorConfig, estimate_direct,
                                         _shade_context, _pick_light)
    from grail.engine import film as flm, camera as cam
    from grail.kernels import intersect as isect
    from grail.core import rng as rngmod
    from grail.shade import bsdf as bx

    res = int(np.sqrt(n))
    scene, meta, _ = cornell_box(xres=res, yres=res, spp=4)

    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros(n, jnp.uint32)

    # ---- raygen
    @jax.jit
    def raygen(pix, samp):
        px = (pix % meta.xres).astype(jnp.int32)
        py = (pix // meta.xres).astype(jnp.int32)
        ufx, ufy = rngmod.sample_2d(meta.sampler, pix, samp, 0)
        ul1, ul2 = rngmod.sample_2d(meta.sampler, pix, samp, 1)
        ut = rngmod.sample_1d(meta.sampler, pix, samp, 2)
        return cam.generate_rays(scene["camera"], px, py, ufx, ufy, ul1, ul2,
                                 ut, meta.cam_kind)
    timeit("raygen", raygen, pix, samp, n_rays=n)
    rays = jax.block_until_ready(raygen(pix, samp))
    o, d = rays["o"], rays["d"]
    tmax = jnp.full((n,), 1e7, jnp.float32)

    # ---- intersections on the cornell scene (36 tris, brute/pallas path)
    close = jax.jit(lambda o, d, tmax: isect.intersect(scene, o, d, tmax))
    timeit("intersect closest (36 tris)", close, o, d, tmax, n_rays=n)
    anyh = jax.jit(lambda o, d, tmax: isect.intersect_p(scene, o, d, tmax))
    timeit("intersect_p (36 tris)", anyh, o, d, tmax, n_rays=n)

    hit = jax.block_until_ready(close(o, d, tmax))

    # BVH stream rows run EARLY: after heavy multi-wave programs the
    # tunnel faults deterministically on these launches (wedging the
    # client); early placement + the per-row guards keep the artifact
    try:
        # ---- BVH streaming traversal on sphere meshes (camera-style rays,
        # sorted into tiles by the dispatch — the production hot path)
        if os.environ.get("MICRO_SKIP_BVH", "0") != "1":
            from grail.scene.bvh import build_bvh_auto, bvh_to_device
            from grail.kernels.bvh_stream import build_stream_table
            for nu, nv, label in ((240, 74, "35k"), (420, 120, "100k")):
                verts, idx = tessellate_sphere(radius=1.0, nu=nu, nv=nv)
                bscene = {"verts": jnp.asarray(verts),
                          "tri_idx": jnp.asarray(idx.astype(np.int32))}
                b_np = build_bvh_auto(verts, idx, max_prims=4, force_leaf=4)
                bscene["bvh"] = bvh_to_device(b_np)
                bscene["bvh"]["stream"] = jnp.asarray(
                    build_stream_table(b_np, verts, idx))
                res_m = int(np.sqrt(n))
                xs, ys = np.meshgrid(np.linspace(-1.2, 1.2, res_m),
                                     np.linspace(-1.2, 1.2, res_m))
                # rays in the renderer's static 8x16 pixel-tile order (the
                # dispatch no longer sorts dynamically; engine/film.py lane_pixel)
                from grail.engine.film import lane_pixel
                lane = np.arange(res_m * res_m)
                px_t, py_t = lane_pixel(jnp.asarray(lane), res_m)
                sel = (np.asarray(py_t).astype(np.int64) * res_m
                       + np.asarray(px_t))
                tgt = np.stack([xs.ravel()[sel], ys.ravel()[sel],
                                np.zeros(res_m * res_m)], -1)
                o_m = np.tile(np.array([0, 0, 4.0], np.float32),
                              (res_m * res_m, 1))
                d_m = tgt - o_m
                d_m /= np.linalg.norm(d_m, axis=1, keepdims=True)
                o_m = jnp.asarray(o_m.astype(np.float32))
                d_m = jnp.asarray(d_m.astype(np.float32))
                bvhfn = jax.jit(
                    lambda o, d, tmax, bs=bscene: isect.intersect(bs, o, d, tmax))
                timeit(f"intersect BVH stream ({label} tris)", bvhfn, o_m, d_m,
                       tmax, n_rays=n)
                pfn = jax.jit(
                    lambda o, d, tmax, bs=bscene: isect.intersect_p(bs, o, d,
                                                                    tmax))
                timeit(f"intersect_p BVH stream ({label} tris)", pfn, o_m, d_m,
                       tmax, n_rays=n)
    except Exception as e:  # noqa: BLE001
        RESULTS["bvh_stream_error"] = str(e)[:200]


    # ---- shading context (geometry + textures + lobes)
    shade = jax.jit(lambda hit, o, d: _shade_context(scene, meta, hit, o, d))
    timeit("shade context (tex+lobes)", shade, hit, o, d, n_rays=n)
    sg, lobes, wo_local = jax.block_until_ready(shade(hit, o, d))

    # ---- BSDF sample + eval
    @jax.jit
    def bsdf_stage(lobes, wo_local, pix, samp):
        u = rngmod.sample_2d(meta.sampler, pix, samp, 8)
        uc = rngmod.sample_1d(meta.sampler, pix, samp, 9)
        bs = bx.bsdf_sample(lobes, wo_local, u[0], u[1], uc, meta.lobe_types,
                            include_specular=True)
        f = bx.bsdf_f(lobes, wo_local, bs["wi"], meta.lobe_types, False)
        pdf = bx.bsdf_pdf(lobes, wo_local, bs["wi"], meta.lobe_types, False)
        return bs["f"], f, pdf
    timeit("bsdf sample+eval+pdf", bsdf_stage, lobes, wo_local, pix, samp,
           n_rays=n)

    # ---- estimate_direct (includes 2 traversals)
    cfg_p = IntegratorConfig(kind="path", max_depth=5)

    @jax.jit
    def ed_stage(sg, lobes, wo_local, pix, samp):
        active = jnp.ones((n,), bool)
        lidx, pmf = _pick_light(scene, meta, cfg_p, pix, samp, 0, active)
        return estimate_direct(
            scene, meta, sg, lobes, wo_local, lidx, pmf,
            rngmod.sample_2d(meta.sampler, pix, samp, 10),
            rngmod.sample_1d(meta.sampler, pix, samp, 11),
            rngmod.sample_1d(meta.sampler, pix, samp, 12),
            rngmod.sample_2d(meta.sampler, pix, samp, 13),
            active)
    timeit("estimate_direct (2 traversals)", ed_stage, sg, lobes, wo_local,
           pix, samp, n_rays=n)

    # ---- material-sorted megabatch pass (shade/megabatch.py): the fused
    # light-branch f/pdf + continuation sample + reuse-pdf over the sorted
    # queue — the production path's per-bounce BSDF work in one visit
    from grail.shade.megabatch import megabatch_shade
    from grail.shade import geometry as geomod, lights as lmod

    @jax.jit
    def mb_stage(sg, wo_local, pix, samp):
        active = jnp.ones((n,), bool)
        lidx, _ = _pick_light(scene, meta, cfg_p, pix, samp, 0, active)
        u2d = rngmod.sample_2d(meta.sampler, pix, samp, 10)
        u3 = rngmod.sample_1d(meta.sampler, pix, samp, 11)
        ls = lmod.sample_li(scene, lidx, sg["p"], u2d[0], u2d[1], u3,
                            meta.light_types, meta.light_image_rows)
        wil = geomod.world_to_local(sg, ls["wi"])
        ub = rngmod.sample_2d(meta.sampler, pix, samp, 12)
        uc = rngmod.sample_1d(meta.sampler, pix, samp, 13)
        return megabatch_shade(scene, meta, sg, wo_local, wil, ub[0], ub[1],
                               uc, active)
    timeit("megabatch shade (sorted, fused)", mb_stage, sg, wo_local, pix,
           samp, n_rays=n)

    # the PRODUCTION shading shape: the same fused per-bounce BSDF work
    # (light-branch f/pdf + continuation sample + reuse pdf) at full width
    # through the masked path — the measured reason the sort is off
    from grail.shade.megabatch import _make_branches

    @jax.jit
    def fw_stage(sg, wo_local, pix, samp):
        gen = _make_branches(scene, meta, n)[-2]
        u2d = rngmod.sample_2d(meta.sampler, pix, samp, 10)
        u3 = rngmod.sample_1d(meta.sampler, pix, samp, 11)
        lidx, _ = _pick_light(scene, meta, cfg_p, pix, samp, 0,
                              jnp.ones((n,), bool))
        ls = lmod.sample_li(scene, lidx, sg["p"], u2d[0], u2d[1], u3,
                            meta.light_types, meta.light_image_rows)
        ub = rngmod.sample_2d(meta.sampler, pix, samp, 12)
        uc = rngmod.sample_1d(meta.sampler, pix, samp, 13)
        blk = {"wo": wo_local, "wil": geomod.world_to_local(sg, ls["wi"]),
               "u1": ub[0], "u2": ub[1], "uc": uc, "p": sg["p"],
               "uv": sg["uv"], "ns": sg["ns"], "ss": sg["ss"],
               "ts": sg["ts"], "mat": jnp.maximum(sg["mat"], 0)}
        return gen(blk)
    timeit("fused shade full-width (masked)", fw_stage, sg, wo_local, pix,
           samp, n_rays=n)

    # ---- film scatter-add
    film = flm.new_film(meta.xres, meta.yres)
    L = jnp.ones((n, 3), jnp.float32)
    sx = (pix % meta.xres).astype(jnp.float32) + 0.5
    sy = (pix // meta.xres).astype(jnp.float32) + 0.5

    @jax.jit
    def film_stage(film, sx, sy, L):
        return flm.add_samples(film, meta.filter, sx, sy, L)
    timeit("film add_samples (scatter)", film_stage, film, sx, sy, L, n_rays=n)

    @jax.jit
    def film_stage_grid(film, sx, sy, L):
        return flm.add_samples_grid(film, meta.filter, sx, sy, L, 1)
    timeit("film add_samples (grid)", film_stage_grid, film, sx, sy, L,
           n_rays=n)

    # ---- full waves
    @jax.jit
    def wave_d(film, pix, samp):
        cfg = IntegratorConfig(kind="direct", max_depth=1)
        return render_wave(scene, meta, cfg, film, samp, pix=pix, grid_chunk=1)
    timeit("full direct wave", wave_d, film, pix, samp, iters=5, n_rays=n)

    @jax.jit
    def wave_p(film, pix, samp):
        return render_wave(scene, meta, cfg_p, film, samp, pix=pix,
                           grid_chunk=1)
    dt = timeit("full path wave (depth 5)", wave_p, film, pix, samp, iters=5,
                n_rays=n)
    print(f"path camera-rays/s: {n / dt / 1e6:.2f} M")

    if "--json" in sys.argv:
        out = sys.argv[sys.argv.index("--json") + 1]
        with open(out, "w") as f:
            json.dump({"backend": jax.default_backend(), "n_rays": n,
                       "stages": RESULTS}, f, indent=1)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
