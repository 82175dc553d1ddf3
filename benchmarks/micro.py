"""Micro-benchmarks of the wavefront stages on the current backend.

Times each stage separately so optimization effort goes where the time is:
raygen, brute-force intersect, BVH intersect, texture+lobe gather, bsdf eval,
estimate_direct, full direct/path waves.

Usage: python benchmarks/micro.py [n_rays_log2]
"""
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
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.2f} ms")
    return dt


def main():
    n_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    skip_bvh = os.environ.get("MICRO_SKIP_BVH", "0") == "1"
    n = 1 << n_log2
    print(f"backend={jax.default_backend()} n_rays={n}")

    from grail.scene.presets import cornell_box, tessellate_sphere
    from grail.engine.render import render_wave, _render_wave_jit
    from grail.engine.integrator import IntegratorConfig, li, estimate_direct, _shade_context
    from grail.engine import film as flm, camera as cam
    from grail.kernels import intersect as isect
    from grail.core import rng as rngmod

    res = int(np.sqrt(n))
    scene, meta, b = cornell_box(xres=res, yres=res, spp=4)

    pix = jnp.arange(n, dtype=jnp.uint32)
    samp = jnp.zeros(n, jnp.uint32)
    px = (pix % meta.xres).astype(jnp.int32)
    py = (pix // meta.xres).astype(jnp.int32)
    u = [rngmod.sample_1d(meta.sampler, pix, samp, d) for d in range(8)]

    raygen = jax.jit(lambda: cam.generate_rays(
        scene["camera"], px, py, u[0], u[1], u[2], u[3], u[4], meta.cam_kind))
    timeit("raygen", raygen)

    rays = raygen()
    tmax = jnp.full((n,), 1e7, jnp.float32)
    brute = jax.jit(lambda o, d: isect.intersect_brute(scene, o, d, tmax))
    timeit("intersect brute 36 tris", brute, rays["o"], rays["d"])

    # BVH on a 35k-tri sphere mesh
    if skip_bvh:
        print("  (BVH stage skipped)")
    from grail.scene.bvh import build_bvh, bvh_to_device
    verts, idx = tessellate_sphere(radius=1.0, nu=240, nv=74)
    bscene = {"verts": jnp.asarray(verts),
              "tri_idx": jnp.asarray(idx.astype(np.int32))}
    bscene["bvh"] = bvh_to_device(build_bvh(verts, idx))
    print(f"  (sphere mesh: {len(idx)} tris, {len(bscene['bvh']['right'])} nodes)")
    if not skip_bvh:
        from grail.kernels.bvh_traverse import bvh_intersect
        bvhfn = jax.jit(lambda o, d: bvh_intersect(bscene, o, d, tmax))
        o_far = rays["o"] * 0 + jnp.asarray([0.0, 0.0, 4.0])
        timeit("intersect BVH 35k tris", bvhfn, o_far, rays["d"])

    hit = brute(rays["o"], rays["d"])
    shade = jax.jit(lambda: _shade_context(scene, meta, hit, rays["o"], rays["d"]))
    timeit("shade context (tex+lobes)", shade)

    cfg_d = IntegratorConfig(kind="direct", max_depth=1)
    cfg_p = IntegratorConfig(kind="path", max_depth=5)
    film = flm.new_film(meta.yres, meta.xres)

    wave_d = jax.jit(lambda f, s: render_wave(scene, meta, cfg_d, f, s))
    timeit("full direct wave", wave_d, film, jnp.uint32(0), iters=5)
    wave_p = jax.jit(lambda f, s: render_wave(scene, meta, cfg_p, f, s))
    dt = timeit("full path wave (depth 5)", wave_p, film, jnp.uint32(0), iters=5)
    print(f"path rays/s: {n / dt / 1e6:.2f} M")


if __name__ == "__main__":
    main()
